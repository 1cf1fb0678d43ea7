/* Stub fftw3.h — filter.h only names these types in struct declarations;
 * no FFTW function is referenced by the protocol TUs we compile. */
#ifndef KA9Q_SHIM_FFTW3_H
#define KA9Q_SHIM_FFTW3_H 1

typedef float fftwf_complex[2];
typedef struct ka9q_shim_fftwf_plan_s *fftwf_plan;

#endif
