"""Overlap-save fast-convolution filter engine, TPU-native.

This is the heart of the rebuild: the reference's master/slave filter
(filter.c:54-252).  One *master* holds the forward FFT of each input block;
any number of *slaves*, each with its own frequency response and decimation
ratio, share that FFT and do only a bin-wise multiply plus a short inverse
FFT.

Differences from the reference, by design:
- No threads, mutexes or blocknum condvars (filter.c:154-157,194-199).
  The master FFT and all slave IFFTs fuse into one jitted block program;
  synchronisation is dataflow.
- State (the M-1 sample overlap) is explicit and carried by the caller,
  so the whole pipeline is `lax.scan`-able and shard_map-able.
- Slaves vectorise over a channel axis (vmap) — the reference's
  one-FFT/N-slaves fan-out becomes the batching axis of the channel bank.

Semantics (bin selection, conjugate folding, CROSS_CONJ ISB trick, FFT
scaling) match filter.c exactly; see slave_execute for the mapping.
"""

from __future__ import annotations

import enum
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FilterType",
    "MasterSpec",
    "SlaveSpec",
    "master_init",
    "master_execute",
    "fft_fourstep",
    "fft_mxu",
    "slave_execute",
    "slave_bin_indices",
    "noise_gain",
    "set_filter_response",
]


class FilterType(enum.Enum):
    """Filter port types (filter.h:17-22)."""

    COMPLEX = "complex"
    REAL = "real"
    CROSS_CONJ = "cross_conj"  # complex with ISB cross-conjugation


class MasterSpec(NamedTuple):
    """Static description of a master (input) filter (struct filter_in,
    filter.h:54-66).  L = input block size, M = impulse length,
    N = L + M - 1 = FFT size."""

    L: int
    M: int
    in_type: FilterType

    @property
    def N(self) -> int:
        return self.L + self.M - 1

    @property
    def nbins(self) -> int:
        """Number of frequency bins the forward FFT produces."""
        return self.N // 2 + 1 if self.in_type is FilterType.REAL else self.N


class SlaveSpec(NamedTuple):
    """Static description of a slave (output) filter (struct filter_out,
    filter.h:67-80)."""

    master: MasterSpec
    decimate: int
    out_type: FilterType

    @property
    def N_dec(self) -> int:
        return self.master.N // self.decimate

    @property
    def olen(self) -> int:
        return self.master.L // self.decimate

    @property
    def nbins(self) -> int:
        """Length of the response array.  Only the real-in/real-out case
        stores half-spectrum responses; complex-in/real-out still needs the
        full response because the conjugate fold (filter.c:232-234) reads
        negative-frequency response bins."""
        if (
            self.master.in_type is FilterType.REAL
            and self.out_type is FilterType.REAL
        ):
            return self.N_dec // 2 + 1
        return self.N_dec


def master_init(spec: MasterSpec, dtype=jnp.float32) -> jax.Array:
    """Zero overlap state: the trailing M-1 samples of the previous block
    (the memset of filter.c:76,85)."""
    if spec.in_type is FilterType.REAL:
        return jnp.zeros((spec.M - 1,), dtype=dtype)
    cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
    return jnp.zeros((spec.M - 1,), dtype=cdtype)


#: Use a decomposed 1D complex FFT at or above this size.  Re-measured
#: (r3, slope method, best-of-2): XLA's monolithic FFT now matches or
#: beats the decomposition up to N = 2^24 (5.47 vs 6.24 ms) — the
#: runtime improved since the round-1 measurement — but loses 1.7x at
#: 2^25 (25.0 vs 14.5 ms) and 1.3x at 2^26 (37.4 vs 28.9 ms).
#: P = 2^(log2 N / 2) (i.e. Q ~ 8192) measured optimal at both sizes
#: for the four-step.  The output transpose costs ~11% of the
#: decomposition; skipping it (comb layout) is NOT a win end-to-end
#: because the channelizer's per-channel windows then become strided
#: column reads that move the same HBM bytes the transpose does.
#:
#: On TPU the default big-FFT path is now fft_mxu (3-level MXU matmul
#: decomposition, r4): 18.2 vs 23.6 ms at 2^26, 9.8 vs 12.2 ms at 2^25
#: (1.25-1.30x over the four-step).
FOURSTEP_MIN = 1 << 25

#: Per-N radix triples for fft_mxu, measured optimal on v5e (r4 sweep:
#: equal-ish factors minimise MXU MACs; minor factor >= 128 keeps every
#: intermediate lane-aligned).
_MXU_RADICES = {1 << 25: (256, 512, 256), 1 << 26: (256, 512, 512)}


def _mxu_radices(N: int) -> tuple[int, int, int] | None:
    """Three power-of-two factors of N, each 128..512, closest to the
    cube root (minimises total MXU MACs while staying lane-aligned)."""
    if N in _MXU_RADICES:
        return _MXU_RADICES[N]
    logN = N.bit_length() - 1
    if (1 << logN) != N:
        return None
    for l1 in (8, 9):                      # 256 first (measured best), 512
        for l2 in (9, 8):
            l3 = logN - l1 - l2
            if 7 <= l3 <= 9:
                return (1 << l1, 1 << l2, 1 << l3)
    return None


def fft_mxu(z: jax.Array, precision=jax.lax.Precision.HIGH,
            radices: tuple[int, int, int] | None = None) -> jax.Array:
    """Natural-order forward FFT as three MXU matmuls (r4).

    N = R1*R2*R3 (each 128..512): contract each digit axis with a small
    DFT matrix, applying the Cooley-Tukey twiddle between levels with an
    exact integer phase mod (same spur argument as fft_fourstep).  The
    contractions are MXU-shaped (K = 128..512), so the FFT rides the
    systolic array instead of XLA's FFT kernels: measured 1.30x at 2^26
    and 1.24x at 2^25 over fft_fourstep on v5e.

    precision: HIGH (default) runs the matmuls as 3-pass bf16 with f32
    accumulation — max spectrum error 2.5e-5 (-92 dB), below the noise
    floor of every supported front end (funcube 16-bit: -96 dBFS;
    hackrf: 8-bit).  HIGHEST is exact f32 (1.6e-7) but loses the 2^26
    win.  KA9Q_EXACT_FFT=1 routes master_execute to fft_fourstep
    instead (exact f32 everywhere).  Tests run on CPU where einsum is
    exact f32 regardless.  Documented in PARITY.md (divergences).
    """
    N = z.shape[-1]
    if radices is None:
        radices = _mxu_radices(N)
    if radices is None or z.ndim != 1:
        return fft_fourstep(z)
    if int(np.prod(radices)) != N:
        raise ValueError(f"radices {radices} do not factor N={N}")
    R1, R2, R3 = radices

    def dftmat(R):
        k = np.arange(R)
        return jnp.asarray(
            np.exp(-2j * np.pi * np.outer(k, k) / R).astype(np.complex64))

    X = z.reshape(R1, R2, R3)
    Y1 = jnp.einsum("au,abc->ubc", dftmat(R1), X, precision=precision)
    u = jnp.arange(R1, dtype=jnp.int32)[:, None, None]
    b = jnp.arange(R2, dtype=jnp.int32)[None, :, None]
    c = jnp.arange(R3, dtype=jnp.int32)[None, None, :]
    frac = (u * (b * R3 + c)) % N          # u*r < N <= 2^26 — fits int32
    ang = jnp.float32(-2.0 * np.pi / N) * frac.astype(jnp.float32)
    Y1 = Y1 * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    Y2 = jnp.einsum("ubc,bv->uvc", Y1, dftmat(R2), precision=precision)
    M1 = R2 * R3
    v = jnp.arange(R2, dtype=jnp.int32)[:, None]
    c2 = jnp.arange(R3, dtype=jnp.int32)[None, :]
    frac2 = (v * c2) % M1
    ang2 = jnp.float32(-2.0 * np.pi / M1) * frac2.astype(jnp.float32)
    Y2 = Y2 * jax.lax.complex(jnp.cos(ang2), jnp.sin(ang2))[None]
    Y3 = jnp.einsum("uvc,cw->uvw", Y2, dftmat(R3), precision=precision)
    # Y3[u,v,w] = X^[u + R1 v + R1 R2 w]: transpose-reverse is natural order
    return jnp.transpose(Y3, (2, 1, 0)).reshape(N)


def fft_fourstep(z: jax.Array) -> jax.Array:
    """Natural-order forward FFT via the four-step (Bailey) decomposition.

    N = P*Q with P,Q ~ sqrt(N): Q-point FFTs over columns, twiddle
    W_N^(k1*p), P-point FFTs over rows, transpose back to natural order.
    Twiddle phases use an exact integer mod N before the float multiply —
    a raw f32 k1*p/N phase reaches thousands of radians and would add
    ~-68 dB spurs; reduced first, the error is ~2^-23 of a cycle."""
    N = z.shape[-1]
    P = 1 << (int(np.log2(N)) // 2)
    if N % P:
        return jnp.fft.fft(z, axis=-1)
    Q = N // P
    zz = z.reshape(z.shape[:-1] + (Q, P))
    C = jnp.fft.fft(zz, axis=-2)                       # Q-pt FFT per column
    k1 = jnp.arange(Q, dtype=jnp.int32)[:, None]
    p = jnp.arange(P, dtype=jnp.int32)[None, :]
    frac = ((k1 * p) % N).astype(jnp.float32) * jnp.float32(1.0 / N)
    ang = (-2.0 * np.pi) * frac
    tw = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    D = jnp.fft.fft(C * tw, axis=-1)                   # D[k1,k2] = X[k1+Q*k2]
    return jnp.swapaxes(D, -1, -2).reshape(z.shape[:-1] + (N,))


def master_execute(
    spec: MasterSpec, overlap: jax.Array, block: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """One overlap-save step (execute_filter_input, filter.c:146-172).

    Concatenates the carried M-1 overlap with the new L-sample block,
    forward-FFTs the N samples, and returns (new_overlap, fdomain).
    The FFT is unnormalised-forward, matching FFTW_FORWARD.  Large
    complex masters use the four-step decomposition (see fft_fourstep).
    """
    if block.shape[-1] != spec.L:
        raise ValueError(f"block length {block.shape[-1]} != L = {spec.L}")
    buf = jnp.concatenate([overlap, block], axis=-1)
    if spec.in_type is FilterType.REAL:
        fdomain = jnp.fft.rfft(buf, axis=-1)
    elif spec.N >= FOURSTEP_MIN:
        if (jax.default_backend() == "tpu" and buf.ndim == 1
                # "0"/"false" must disable, not enable (truthy-string trap)
                and os.environ.get("KA9Q_EXACT_FFT", "0").lower()
                in ("", "0", "false", "no")
                and _mxu_radices(spec.N) is not None):
            fdomain = fft_mxu(buf)
        else:
            fdomain = fft_fourstep(buf)
    else:
        fdomain = jnp.fft.fft(buf, axis=-1)
    new_overlap = buf[..., spec.L:]
    return new_overlap, fdomain


def slave_bin_indices(spec: SlaveSpec) -> np.ndarray:
    """Master-spectrum bin index for each slave bin, as gathered by
    execute_filter_output (filter.c:206,225-227).

    For complex-in/complex-out: slave bin p in 0..N_dec/2 reads master bin
    p; slave bin dn in N_dec/2+1..N_dec-1 reads master bin N - N_dec + dn
    (the top of the master spectrum, i.e. the negative frequencies).

    The channel bank reuses this pattern shifted by an integer bin rotation
    per channel (frequency conversion in the frequency domain).
    """
    N, N_dec = spec.master.N, spec.N_dec
    h = N_dec // 2
    if spec.master.in_type is not FilterType.REAL and spec.out_type in (
        FilterType.COMPLEX,
        FilterType.CROSS_CONJ,
    ):
        return np.concatenate([np.arange(h + 1), np.arange(N - h + 1, N)])
    raise ValueError("bin indices only defined for complex in / complex out")


def _cross_conj(f_fd: jax.Array, N_dec: int) -> jax.Array:
    """ISB cross-conjugate trick (filter.c:239-249): for p in 1..N_dec/2-1
    paired with dn = N_dec - p, replace (pos, neg) with
    (pos + conj(neg), neg - conj(pos)).  Forces the lower sideband onto I
    and the upper onto Q."""
    h = N_dec // 2
    pos = f_fd[..., 1:h]            # p = 1 .. h-1
    neg = f_fd[..., :h:-1]          # dn = N_dec-1 .. h+1 (pairs dn = N_dec - p)
    new_pos = pos + jnp.conj(neg)
    new_neg = neg - jnp.conj(pos)
    f_fd = f_fd.at[..., 1:h].set(new_pos)
    f_fd = f_fd.at[..., :h:-1].set(new_neg)
    return f_fd


def slave_execute(
    spec: SlaveSpec, fdomain: jax.Array, response: jax.Array
) -> jax.Array:
    """One slave step (execute_filter_output, filter.c:175-252).

    Multiplies the shared master spectrum by this slave's frequency
    response with the reference's exact bin mapping and conjugate folding,
    inverse-FFTs at the decimated size, and returns the last `olen` (valid)
    output samples.  The IFFT is unnormalised (FFTW_BACKWARD), i.e.
    N_dec * ifft().
    """
    N, N_dec = spec.master.N, spec.N_dec
    h = N_dec // 2
    in_real = spec.master.in_type is FilterType.REAL
    out = spec.out_type

    if response.shape[-1] != spec.nbins:
        raise ValueError(f"response length {response.shape[-1]} != {spec.nbins}")

    if not in_real and out in (FilterType.COMPLEX, FilterType.CROSS_CONJ):
        # complex in, complex out (filter.c:206-207, 225-227)
        pos = response[..., : h + 1] * fdomain[..., : h + 1]
        neg = response[..., h + 1 :] * fdomain[..., N - h + 1 :]
        f_fd = jnp.concatenate([pos, neg], axis=-1)
        if out is FilterType.CROSS_CONJ:
            f_fd = _cross_conj(f_fd, N_dec)
        y = jnp.fft.ifft(f_fd, axis=-1) * N_dec
        return y[..., N_dec - spec.olen :]

    if not in_real and out is FilterType.REAL:
        # complex in, real out: fold conjugates of negative frequencies into
        # the positive bins (filter.c:228-235).
        pos = response[..., : h + 1] * fdomain[..., : h + 1]
        # loop: n=N-1, p=1, dn=N_dec-1; while p < h  ->  p in 1..h-1,
        # dn = N_dec-1 .. h+1, n = N-1 .. N-h+1
        fold = jnp.conj(
            response[..., : h : -1] * fdomain[..., : N - h : -1]
        )
        pos = pos.at[..., 1:h].add(fold)
        y = jnp.fft.irfft(pos, N_dec, axis=-1) * N_dec
        return y[..., N_dec - spec.olen :]

    if in_real and out is FilterType.REAL:
        # real in, real out (filter.c:206-207 only): first N_dec/2+1 bins.
        f_fd = response[..., : h + 1] * fdomain[..., : h + 1]
        y = jnp.fft.irfft(f_fd, N_dec, axis=-1) * N_dec
        return y[..., N_dec - spec.olen :]

    if in_real and out in (FilterType.COMPLEX, FilterType.CROSS_CONJ):
        # real in, complex out: F[-f] = conj(F[+f]) (filter.c:209-216).
        pos = response[..., : h + 1] * fdomain[..., : h + 1]
        # p=1, dn=N_dec-1; while dn > h  ->  dn = N_dec-1..h+1, p = 1..h-1
        neg = response[..., h + 1 :] * jnp.conj(fdomain[..., h - 1 : 0 : -1])
        f_fd = jnp.concatenate([pos, neg], axis=-1)
        if out is FilterType.CROSS_CONJ:
            f_fd = _cross_conj(f_fd, N_dec)
        y = jnp.fft.ifft(f_fd, axis=-1) * N_dec
        return y[..., N_dec - spec.olen :]

    raise ValueError(f"unsupported type combination {spec.master.in_type}/{out}")


def noise_gain(spec: SlaveSpec, response: np.ndarray) -> float:
    """Filter gain on uniform gaussian noise (filter.c:472-497).

    Sum of |response|^2 over the slave's bins, times N (undoing the 1/N
    amplitude pre-scale), times 2 for REAL / CROSS_CONJ outputs (undoing
    their sqrt(1/2) amplitude factor)."""
    N = spec.master.N
    if spec.master.in_type is FilterType.REAL and spec.out_type is FilterType.REAL:
        s = float(np.sum(np.abs(response[: spec.N_dec // 2 + 1]) ** 2))
    else:
        s = float(np.sum(np.abs(response[: spec.N_dec]) ** 2))
    if spec.out_type in (FilterType.REAL, FilterType.CROSS_CONJ):
        return 2.0 * N * s
    return float(N * s)


def set_filter_response(
    spec: SlaveSpec, low: float, high: float, beta: float
) -> np.ndarray:
    """Design a slave's response à la set_filter (filter.c:500-546).

    low/high are in cycles/sample of the *decimated* output rate.  Returns
    the complex64 response; the caller swaps it into its channel config (the
    reference's hot-swap mutex becomes a functional update here).
    """
    from .window import brickwall_response, design_bandpass, window_rfilter

    if (
        spec.master.in_type is FilterType.REAL
        and spec.out_type is FilterType.REAL
    ):
        # Half-spectrum design via window_rfilter, as the reference's
        # real/real users do directly (fm.c:56-65, packet.c).
        L_dec = spec.master.L // spec.decimate
        M_dec = (spec.master.M - 1) // spec.decimate + 1
        gain = np.sqrt(0.5) / spec.master.N
        full = brickwall_response(spec.N_dec, low, high, gain)
        resp = window_rfilter(L_dec, M_dec, full[: spec.N_dec // 2 + 1], beta)
        return resp.astype(np.complex64)

    return design_bandpass(
        spec.master.L,
        spec.master.M,
        spec.decimate,
        low,
        high,
        beta,
        real_output=spec.out_type is FilterType.REAL,
        cross_conj=spec.out_type is FilterType.CROSS_CONJ,
    )
