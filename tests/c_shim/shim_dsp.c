/* Flat-argument wrappers around the reference's DSP translation units
 * (osc.c, dsp.c, filter.c — decimate.c's entry points are already flat and
 * are called from ctypes directly), so tests/test_c_dsp_parity.py can
 * differentially test the rebuild's DSP layer against the COMPILED C
 * instead of a Python transliteration (VERDICT r4 ask #1).
 *
 * complex-float returns are flattened to float[2] out-params (ctypes has
 * no portable C99 complex return), and filter objects are passed around as
 * opaque pointers so ctypes never sees pthread-bearing struct layouts.
 */
#define _GNU_SOURCE 1
#include <complex.h>
#include <math.h>
#include <stdlib.h>
#include <string.h>

#include "osc.h"
#include "dsp.h"
#include "filter.h"

/* ---- osc.c: step_osc phase trajectories (osc.c:22-59) ---- */

/* Run a fresh oscillator n samples at (f, r); out = interleaved re/im of
 * the n step_osc() return values (the phase BEFORE each step). */
int shim_osc_run(double f, double r, int n, double *out) {
  struct osc osc;
  memset(&osc, 0, sizeof(osc));
  set_osc(&osc, f, r);
  for (int i = 0; i < n; i++) {
    complex double ph = step_osc(&osc);
    out[2 * i] = creal(ph);
    out[2 * i + 1] = cimag(ph);
  }
  return n;
}

/* Same, with a phase-preserving retune after n1 samples (set_osc keeps the
 * phasor when already initialised, osc.c:24-27). */
int shim_osc_run_retune(double f1, double r1, int n1, double f2, double r2,
                        int n2, double *out) {
  struct osc osc;
  memset(&osc, 0, sizeof(osc));
  set_osc(&osc, f1, r1);
  for (int i = 0; i < n1; i++) {
    complex double ph = step_osc(&osc);
    out[2 * i] = creal(ph);
    out[2 * i + 1] = cimag(ph);
  }
  set_osc(&osc, f2, r2);
  for (int i = 0; i < n2; i++) {
    complex double ph = step_osc(&osc);
    out[2 * (n1 + i)] = creal(ph);
    out[2 * (n1 + i) + 1] = cimag(ph);
  }
  return n1 + n2;
}

/* ---- dsp.c: math helpers (dsp.c:16-50) ---- */

void shim_csincosf(float x, float *out2) {
  complex float v = csincosf(x);
  out2[0] = crealf(v);
  out2[1] = cimagf(v);
}

void shim_csincospif(float x, float *out2) {
  complex float v = csincospif(x);
  out2[0] = crealf(v);
  out2[1] = cimagf(v);
}

void shim_csincospi(double x, double *out2) {
  complex double v = csincospi(x);
  out2[0] = creal(v);
  out2[1] = cimag(v);
}

float shim_cnrmf(float re, float im) { return cnrmf(CMPLXF(re, im)); }

/* ---- filter.c: master/slave fast-convolution engine ---- */

void *shim_filter_master(int L, int M, int in_type) {
  return create_filter_input((unsigned)L, (unsigned)M,
                             (enum filtertype)in_type);
}

void *shim_filter_slave(void *master, int decimate, int out_type) {
  return create_filter_output((struct filter_in *)master, NULL,
                              (unsigned)decimate, (enum filtertype)out_type);
}

int shim_slave_set(void *slave, float low, float high, float beta) {
  return set_filter((struct filter_out *)slave, low, high, beta);
}

/* Install a raw response (interleaved re/im, n complex bins) without the
 * set_filter design path, to isolate the streaming execute path. */
int shim_slave_set_response(void *sv, const float *resp, int n) {
  struct filter_out *s = sv;
  complex float *r = fftwf_alloc_complex(n);
  if (r == NULL)
    return -1;
  memcpy(r, resp, (size_t)n * sizeof(complex float));
  complex float *tmp = s->response;
  s->response = r;
  s->noise_gain = noise_gain(s);
  if (tmp != NULL)
    fftwf_free(tmp);
  return 0;
}

/* Copy the slave's response out (interleaved); returns bin count. */
int shim_slave_response(void *sv, float *out, int maxn) {
  struct filter_out *s = sv;
  struct filter_in *m = s->master;
  int N_dec = (int)(m->ilen + m->impulse_length - 1) / (int)s->decimate;
  int n = N_dec <= maxn ? N_dec : maxn;
  memcpy(out, s->response, (size_t)n * sizeof(complex float));
  return n;
}

float shim_slave_noise_gain(void *sv) {
  return ((struct filter_out *)sv)->noise_gain;
}

/* Write one L-sample block into the master's user area and run the forward
 * FFT + overlap-save shift (execute_filter_input, filter.c:146-172).
 * `in` is L floats (REAL master) or 2L floats interleaved (COMPLEX). */
int shim_master_exec(void *mv, const float *in) {
  struct filter_in *m = mv;
  if (m->in_type == REAL)
    memcpy(m->input.r, in, m->ilen * sizeof(float));
  else
    memcpy(m->input.c, in, m->ilen * sizeof(complex float));
  return execute_filter_input(m);
}

/* Copy the master's frequency-domain block out; returns bin count. */
int shim_master_fdomain(void *mv, float *out) {
  struct filter_in *m = mv;
  int N = (int)(m->ilen + m->impulse_length - 1);
  int n = m->in_type == REAL ? N / 2 + 1 : N;
  memcpy(out, m->fdomain, (size_t)n * sizeof(complex float));
  return n;
}

/* Run one slave block (execute_filter_output, filter.c:175-252) and copy
 * the olen user samples out (interleaved complex, or olen floats for REAL
 * output).  Returns olen, or -2 if no fresh master block (the condvar wait
 * would deadlock a single-threaded caller). */
int shim_slave_exec(void *sv, float *out) {
  struct filter_out *s = sv;
  struct filter_in *m = s->master;
  if (s->blocknum == m->blocknum)
    return -2;
  if (execute_filter_output(s) < 0)
    return -1;
  if (s->out_type == REAL)
    memcpy(out, s->output.r, s->olen * sizeof(float));
  else
    memcpy(out, s->output.c, s->olen * sizeof(complex float));
  return (int)s->olen;
}

void shim_slave_free(void *sv) { delete_filter_output(sv); }
void shim_master_free(void *mv) { delete_filter_input(mv); }

/* window_filter / window_rfilter with oracle-side malloc'd buffers (the
 * reference asserts malloc_usable_size on its argument, which a ctypes
 * array would fail).  resp_io is interleaved re/im, N (or N/2+1) bins. */
int shim_window_filter(int L, int M, float *resp_io, float beta) {
  int N = L + M - 1;
  complex float *buf = fftwf_alloc_complex(N);
  if (buf == NULL)
    return -1;
  memcpy(buf, resp_io, (size_t)N * sizeof(complex float));
  int r = window_filter(L, M, buf, beta);
  memcpy(resp_io, buf, (size_t)N * sizeof(complex float));
  fftwf_free(buf);
  return r;
}

int shim_window_rfilter(int L, int M, float *resp_io, float beta) {
  int N = L + M - 1;
  int nb = N / 2 + 1;
  complex float *buf = fftwf_alloc_complex(nb);
  if (buf == NULL)
    return -1;
  memcpy(buf, resp_io, (size_t)nb * sizeof(complex float));
  int r = window_rfilter(L, M, buf, beta);
  memcpy(resp_io, buf, (size_t)nb * sizeof(complex float));
  fftwf_free(buf);
  return r;
}

/* ---- filter.c: IIR complex notch (filter.c:551-571) ---- */

int shim_notch_run(double f, float bw, const float *in_iq, float *out_iq,
                   int n) {
  struct notchfilter *nf = notch_create(f, bw);
  if (nf == NULL)
    return -1;
  for (int i = 0; i < n; i++) {
    complex float s = CMPLXF(in_iq[2 * i], in_iq[2 * i + 1]);
    complex float y = notch(nf, s);
    out_iq[2 * i] = crealf(y);
    out_iq[2 * i + 1] = cimagf(y);
  }
  free(nf);
  return n;
}
