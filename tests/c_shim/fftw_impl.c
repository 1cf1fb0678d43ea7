/* Minimal correct FFT backing the fftwf_* shim (stub/fftw3.h) so the
 * reference's filter.c runs unmodified as a differential oracle.
 *
 * Everything is computed in double and cast to float on store — the oracle
 * should be MORE accurate than both the reference's FFTW-float build and
 * the rebuild's float32 XLA FFTs, so residuals measure THEIR error, not
 * ours.  Power-of-two sizes use an iterative radix-2 Cooley-Tukey with
 * directly-computed twiddles; anything else falls back to a naive O(n^2)
 * DFT (test geometries are small).
 *
 * Not shipped; built only into tests' libka9qref.so by tests/c_ref.py.
 */
#define _GNU_SOURCE 1
#include <math.h>
#include <stdlib.h>
#include <string.h>

#include "fftw3.h"

struct ka9q_shim_fftwf_plan_s {
  int kind; /* 0 = c2c, 1 = r2c, 2 = c2r */
  int n;
  int sign; /* FFTW_FORWARD / FFTW_BACKWARD, c2c only */
  float *rbuf;
  fftwf_complex *cin;
  fftwf_complex *cout;
};

void *fftwf_malloc(size_t size) { return malloc(size); }
float *fftwf_alloc_real(size_t n) { return calloc(n, sizeof(float)); }
fftwf_complex *fftwf_alloc_complex(size_t n) {
  return calloc(n, sizeof(fftwf_complex));
}
void fftwf_free(void *p) { free(p); }

/* In-place complex transform, unnormalised; sign = -1 forward, +1 inverse. */
static void dft(int n, double *re, double *im, int sign) {
  if (n <= 1)
    return;
  if ((n & (n - 1)) == 0) {
    /* bit-reversal permutation */
    for (int i = 1, j = 0; i < n; i++) {
      int bit = n >> 1;
      for (; j & bit; bit >>= 1)
        j ^= bit;
      j ^= bit;
      if (i < j) {
        double t = re[i]; re[i] = re[j]; re[j] = t;
        t = im[i]; im[i] = im[j]; im[j] = t;
      }
    }
    for (int len = 2; len <= n; len <<= 1) {
      double ang = sign * 2.0 * M_PI / len;
      for (int i = 0; i < n; i += len) {
        for (int j = 0; j < len / 2; j++) {
          /* direct twiddle: no recurrence error accumulation */
          double cr = cos(ang * j), ci = sin(ang * j);
          int a = i + j, b = i + j + len / 2;
          double tr = re[b] * cr - im[b] * ci;
          double ti = re[b] * ci + im[b] * cr;
          re[b] = re[a] - tr;
          im[b] = im[a] - ti;
          re[a] += tr;
          im[a] += ti;
        }
      }
    }
  } else {
    double *tr = malloc(n * sizeof(double));
    double *ti = malloc(n * sizeof(double));
    for (int k = 0; k < n; k++) {
      double sr = 0, si = 0;
      for (int j = 0; j < n; j++) {
        /* reduce j*k mod n first: exact phase for any n */
        double ang = sign * 2.0 * M_PI * (double)((long long)j * k % n) / n;
        double cr = cos(ang), ci = sin(ang);
        sr += re[j] * cr - im[j] * ci;
        si += re[j] * ci + im[j] * cr;
      }
      tr[k] = sr;
      ti[k] = si;
    }
    memcpy(re, tr, n * sizeof(double));
    memcpy(im, ti, n * sizeof(double));
    free(tr);
    free(ti);
  }
}

static fftwf_plan mkplan(int kind, int n, int sign) {
  fftwf_plan p = calloc(1, sizeof(*p));
  p->kind = kind;
  p->n = n;
  p->sign = sign;
  return p;
}

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags) {
  (void)flags;
  fftwf_plan p = mkplan(0, n, sign);
  p->cin = in;
  p->cout = out;
  return p;
}

fftwf_plan fftwf_plan_dft_r2c_1d(int n, float *in, fftwf_complex *out,
                                 unsigned flags) {
  (void)flags;
  fftwf_plan p = mkplan(1, n, 0);
  p->rbuf = in;
  p->cout = out;
  return p;
}

fftwf_plan fftwf_plan_dft_c2r_1d(int n, fftwf_complex *in, float *out,
                                 unsigned flags) {
  (void)flags;
  fftwf_plan p = mkplan(2, n, 0);
  p->cin = in;
  p->rbuf = out;
  return p;
}

void fftwf_execute(fftwf_plan p) {
  int n = p->n;
  double *re = malloc(n * sizeof(double));
  double *im = malloc(n * sizeof(double));
  switch (p->kind) {
  case 0: /* c2c */
    for (int i = 0; i < n; i++) {
      re[i] = p->cin[i][0];
      im[i] = p->cin[i][1];
    }
    dft(n, re, im, p->sign);
    for (int i = 0; i < n; i++) {
      p->cout[i][0] = (float)re[i];
      p->cout[i][1] = (float)im[i];
    }
    break;
  case 1: /* r2c: forward, first n/2+1 bins */
    for (int i = 0; i < n; i++) {
      re[i] = p->rbuf[i];
      im[i] = 0.0;
    }
    dft(n, re, im, -1);
    for (int i = 0; i <= n / 2; i++) {
      p->cout[i][0] = (float)re[i];
      p->cout[i][1] = (float)im[i];
    }
    break;
  case 2: /* c2r: hermitian n/2+1 bins in, n reals out, unnormalised */
    for (int i = 0; i <= n / 2; i++) {
      re[i] = p->cin[i][0];
      im[i] = p->cin[i][1];
    }
    for (int i = n / 2 + 1; i < n; i++) {
      re[i] = p->cin[n - i][0];
      im[i] = -p->cin[n - i][1];
    }
    dft(n, re, im, +1);
    for (int i = 0; i < n; i++)
      p->rbuf[i] = (float)re[i];
    break;
  }
  free(re);
  free(im);
}

void fftwf_destroy_plan(fftwf_plan p) { free(p); }
