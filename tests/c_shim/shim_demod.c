/* Drive the reference DEMODULATOR threads (am.c, fm.c, linear.c) as a
 * compiled-C oracle, extending the r5 DSP oracle (shim_dsp.c) from the
 * filter layer up to demodulated PCM.  This grounds the BASELINE metric
 * ("PCM RMS error vs the C reference") in the actual reference demods,
 * not the Python transliteration (tests/golden_ref.py).
 *
 * How it works: the demods are pthread entry points that loop on the
 * master/slave condvar handshake (filter.c:175-199) and emit audio via
 * send_mono/stereo_output (audio.c — NOT compiled here).  We provide
 * capture implementations of send_*_output that append to a buffer and
 * post a semaphore, so the feeder can pace the master filter one block
 * at a time (the master keeps only the latest fdomain, filter.c:146-172
 * — running ahead would drop blocks).  compute_n0 (radio.c:383-425) only
 * feeds the sig.n0 status field, never the audio path, so it is stubbed.
 *
 * Shutdown mirrors set_mode (radio.c:322-374): set demod->terminate,
 * feed one final block to wake the thread out of execute_filter_output,
 * then join.  The final (wake) block's audio is captured too; callers
 * trim to nblocks * olen samples.
 */
#define _GNU_SOURCE 1
#include <complex.h>
#include <math.h>
#include <pthread.h>
#include <semaphore.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <unistd.h>

/* set SHIM_DEMOD_TRACE=1 for phase markers on stderr (hang triage) */
#define TRACE(...)                                                         \
  do {                                                                     \
    if (getenv("SHIM_DEMOD_TRACE")) {                                      \
      fprintf(stderr, __VA_ARGS__);                                        \
      fputc('\n', stderr);                                                 \
      fflush(stderr);                                                      \
    }                                                                      \
  } while (0)

#include <fftw3.h>

#include "misc.h"
#include "dsp.h"
#include "filter.h"
#include "radio.h"

/* ---- captured PCM + one-post-per-block handshake ---- */

static float *g_cap;
static size_t g_cap_len, g_cap_max;
static sem_t g_block_done;

static void cap_append(const float *s, size_t n) {
  if (g_cap_len + n > g_cap_max) {
    g_cap_max = 2 * (g_cap_len + n) + 4096;
    g_cap = realloc(g_cap, g_cap_max * sizeof(float));
  }
  memcpy(g_cap + g_cap_len, s, n * sizeof(float));
  g_cap_len += n;
}

/* audio.c:82-101 replacement: capture + block handshake.  Every demod
 * calls exactly one of these once per input block (fm.c:173 emits even
 * when squelched — zeros). */
int send_mono_output(struct demod *d, const float *s, int n) {
  (void)d;
  cap_append(s, (size_t)n);
  TRACE("sent %zu", g_cap_len);
  sem_post(&g_block_done);
  return 0;
}

int send_stereo_output(struct demod *d, const float *s, int n) {
  (void)d;
  cap_append(s, 2 * (size_t)n); /* interleaved L/R pairs */
  sem_post(&g_block_done);
  return 0;
}

/* radio.c:383-425 — status-only (sig.n0); no effect on audio. */
const float compute_n0(struct demod const *d) {
  (void)d;
  return 0.0f;
}

static struct timespec deadline_in_ms(int ms) {
  struct timespec ts;
  clock_gettime(CLOCK_REALTIME, &ts);
  ts.tv_nsec += (long)ms * 1000000L;
  while (ts.tv_nsec >= 1000000000L) {
    ts.tv_sec++;
    ts.tv_nsec -= 1000000000L;
  }
  return ts;
}

static int timedjoin_ms(pthread_t th, int ms) {
  struct timespec ts = deadline_in_ms(ms);
  return pthread_timedjoin_np(th, NULL, &ts);
}

/* ---- the harness ---- */

/* kind: 0 = demod_am, 1 = demod_fm, 2 = demod_linear.
 * low/high in Hz; hangtime s; recovery_rate dB/s; headroom is VOLTAGE
 * (main.c:117 passes pow(10,-15/20)); shift_hz the post-detection CW
 * shift (radio.c:304-311).  in_iq = nblocks*L interleaved float pairs.
 * channels (linear only — am/fm force mono): 1 = mono (I channel),
 * 2 = stereo I/Q pairs (set_mode from the mode table, radio.c:354).
 * out receives captured PCM (mono floats, or interleaved stereo when
 * the mode is stereo); sig8 receives {snr, foffset, pdeviation, plfreq,
 * bb_power, n0, cphase, pll_lock}.  Returns floats captured (callers
 * trim the wake block), or -1. */
int shim_demod_run(int kind, int samprate, int L, int M, int decimate,
                   float low, float high, float kaiser_beta,
                   float headroom, float hangtime, float recovery_rate,
                   int flat, int pll, int square, int isb, int channels,
                   double shift_hz,
                   const float *in_iq, int nblocks,
                   float *out, long out_max, float *sig8) {
  struct demod *d = calloc(1, sizeof(*d));
  if (d == NULL)
    return -1;
  g_cap_len = 0;
  sem_init(&g_block_done, 0, 0);

  d->input.samprate = samprate;
  d->filter.L = L;
  d->filter.M = M;
  d->filter.decimate = decimate;
  d->filter.low = low;
  d->filter.high = high;
  d->filter.kaiser_beta = kaiser_beta;
  d->filter.isb = isb;
  d->agc.headroom = headroom;
  d->agc.hangtime = hangtime;
  d->agc.recovery_rate = recovery_rate;
  d->opt.flat = flat;
  d->opt.pll = pll;
  d->opt.square = square;
  d->output.channels = channels;
  d->sig.n0 = NAN;
  d->tune.shift = shift_hz;
  if (shift_hz != 0) /* set_shift, radio.c:304-311 */
    set_osc(&d->shift, shift_hz * d->filter.decimate / (double)samprate, 0.0);

  d->filter.in = create_filter_input((unsigned)L, (unsigned)M, COMPLEX);
  if (d->filter.in == NULL) {
    free(d);
    return -1;
  }

  void *(*fn)(void *) = kind == 0   ? demod_am
                        : kind == 1 ? demod_fm
                                    : demod_linear;
  pthread_t th;
  if (pthread_create(&th, NULL, fn, d) != 0) {
    delete_filter_input(d->filter.in);
    free(d);
    return -1;
  }

  /* Wait until the demod created its slave AND set_filter installed the
   * response (execute asserts response != NULL, filter.c:203). */
  for (int spin = 0; d->filter.out == NULL || d->filter.out->response == NULL;
       spin++) {
    if (spin > 20000) { /* 20 s — thread failed to start */
      d->terminate = 1;
      pthread_join(th, NULL);
      delete_filter_input(d->filter.in);
      free(d);
      return -1;
    }
    usleep(1000);
  }

  TRACE("started kind=%d", kind);
  for (int b = 0; b < nblocks; b++) {
    memcpy(d->filter.in->input.c, in_iq + (size_t)b * 2 * L,
           (size_t)L * sizeof(complex float));
    execute_filter_input(d->filter.in);
    TRACE("fed %d", b);
    sem_wait(&g_block_done);
    TRACE("got %d", b);
  }

  /* Graceful termination (the radio.c:322-374 respawn sequence).  The
   * demod posts its last output BEFORE re-checking terminate, so one
   * wake block is racy: if the thread sees terminate before blocking in
   * execute_filter_output it exits without consuming the block (and a
   * waiting sem_wait here would hang).  The reference never hits this
   * because its feeder streams continuously — so emulate that: keep
   * feeding zero blocks until the thread joins.  terminate is set
   * before the first wake feed, so any demod/pltask iteration that
   * consumes a wake block observes it on the next loop check and exits
   * (mutex acquire/release in the filter handshake orders the store). */
  d->terminate = 1;
  int joined = -1;
  for (int tries = 0; tries < 100 && joined != 0; tries++) { /* <= ~10 s */
    memset(d->filter.in->input.c, 0, (size_t)L * sizeof(complex float));
    execute_filter_input(d->filter.in);
    TRACE("fed wake %d", tries);
    joined = timedjoin_ms(th, 50);
    /* FM only: if the demod exited its loop while pltask was already
     * parked in execute_filter_output(pl_filter) — caught up, waiting
     * for an audio block that now never comes — demod_fm deadlocks in
     * pthread_join(pl_thread) (fm.c:176) and no amount of IF feeding
     * wakes it.  Release pltask with a phantom audio_master block: a
     * blocknum bump + broadcast under the master's own mutex.  pltask
     * re-reads terminate after consuming it and exits (the phantom is
     * ~30 PL samples of stale fdomain — far below the 512-sample PL
     * FFT cadence, fm.c:250, so sig.plfreq is untouched).  The extra
     * timedjoin first narrows the (theoretical) window in which
     * demod_fm could complete and free audio_master between our check
     * and the bump. */
    if (joined != 0 && tries >= 2 && d->audio_master != NULL) {
      joined = timedjoin_ms(th, 200);
      if (joined != 0) {
        struct filter_in *am = d->audio_master;
        pthread_mutex_lock(&am->filter_mutex);
        am->blocknum++;
        pthread_cond_broadcast(&am->filter_cond);
        pthread_mutex_unlock(&am->filter_mutex);
        TRACE("bumped audio_master");
        joined = timedjoin_ms(th, 500);
      }
    }
  }
  TRACE("joined=%d", joined);
  if (joined != 0) { /* demod thread wedged; abandon it rather than hang
                      * (leak d and the filter — the thread may still
                      * reference them) */
    sem_destroy(&g_block_done);
    return -1;
  }

  if (sig8 != NULL) {
    sig8[0] = d->sig.snr;
    sig8[1] = d->sig.foffset;
    sig8[2] = d->sig.pdeviation;
    sig8[3] = d->sig.plfreq;
    sig8[4] = d->sig.bb_power;
    sig8[5] = d->sig.n0;
    sig8[6] = d->sig.cphase;
    sig8[7] = (float)d->sig.pll_lock;
  }

  long n = (long)g_cap_len < out_max ? (long)g_cap_len : out_max;
  memcpy(out, g_cap, (size_t)n * sizeof(float));
  delete_filter_input(d->filter.in);
  free(d);
  sem_destroy(&g_block_done);
  return (int)n;
}
