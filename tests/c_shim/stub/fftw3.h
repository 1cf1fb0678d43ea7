/* fftw3.h shim — a REAL (double-precision, unnormalised) FFT behind the
 * fftwf_* API surface that filter.c uses, so the reference's fast-convolution
 * engine (filter.c:54-546) compiles and runs as a differential oracle.
 * Implemented in tests/c_shim/fftw_impl.c; semantics match FFTW3:
 *   - plans capture the buffers given at plan time,
 *   - transforms are unnormalised (forward * backward == N * identity),
 *   - r2c fills n/2+1 bins; c2r consumes n/2+1 bins (input preserved —
 *     FFTW may destroy it, callers must not rely on it either way),
 *   - fftwf_alloc_* uses malloc so the reference's malloc_usable_size
 *     asserts hold.
 */
#ifndef KA9Q_SHIM_FFTW3_H
#define KA9Q_SHIM_FFTW3_H 1

#include <stddef.h>

typedef float fftwf_complex[2];
typedef struct ka9q_shim_fftwf_plan_s *fftwf_plan;

#define FFTW_FORWARD  (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_ESTIMATE (1U << 6)
#define FFTW_MEASURE  (0U)

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags);
fftwf_plan fftwf_plan_dft_r2c_1d(int n, float *in, fftwf_complex *out,
                                 unsigned flags);
fftwf_plan fftwf_plan_dft_c2r_1d(int n, fftwf_complex *in, float *out,
                                 unsigned flags);
void fftwf_execute(fftwf_plan p);
void fftwf_destroy_plan(fftwf_plan p);

void *fftwf_malloc(size_t size);
float *fftwf_alloc_real(size_t n);
fftwf_complex *fftwf_alloc_complex(size_t n);
void fftwf_free(void *p);

#endif
