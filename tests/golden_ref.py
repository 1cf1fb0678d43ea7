"""Golden reference executor: the C receiver's per-sample semantics in
float32 numpy.

This reproduces the reference's sample-by-sample control flow (radio.c
proc_samples, am.c/fm.c/linear.c demod loops) literally — sequential
recurrences, per-sample AGC, per-sample discriminator state — as a parity
oracle for the vectorised TPU pipeline.  BASELINE.json's acceptance metric
is PCM RMS error vs the C reference in dBFS; with no FFTW in this image
the C itself cannot be built, so this executor IS the C semantics at
float32 precision (each step annotated with its file:line source).

Deliberately slow and literal.  Test-only code.
"""

from __future__ import annotations

import numpy as np

from ka9q_sdr_tpu.ops.fftfilt import (
    FilterType,
    MasterSpec,
    SlaveSpec,
    set_filter_response,
)
from ka9q_sdr_tpu.ops.window import window_rfilter

F32 = np.float32


class GoldenMaster:
    """execute_filter_input (filter.c:146-172): overlap-save forward FFT."""

    def __init__(self, L, M, real=False):
        self.L, self.M, self.N = L, M, L + M - 1
        self.real = real
        dt = np.float32 if real else np.complex64
        self.buf = np.zeros(self.N, dt)

    def execute(self, block):
        self.buf[: self.M - 1] = self.buf[self.L :]
        self.buf[self.M - 1 :] = block
        if self.real:
            return np.fft.rfft(self.buf).astype(np.complex64)
        return np.fft.fft(self.buf).astype(np.complex64)


class GoldenSlave:
    """execute_filter_output (filter.c:175-252) for the cases the demods
    use: complex in / complex out, and real in / real out."""

    def __init__(self, master: GoldenMaster, response, decimate, out_real=False):
        self.m = master
        self.response = np.asarray(response, np.complex64)
        self.dec = decimate
        self.N_dec = master.N // decimate
        self.olen = master.L // decimate
        self.out_real = out_real

    def execute(self, fdomain):
        h = self.N_dec // 2
        if self.m.real and self.out_real:
            f_fd = self.response[: h + 1] * fdomain[: h + 1]
            y = np.fft.irfft(f_fd, self.N_dec) * self.N_dec
            return y[self.N_dec - self.olen :].astype(np.float32)
        pos = self.response[: h + 1] * fdomain[: h + 1]
        neg = self.response[h + 1 :] * fdomain[self.m.N - h + 1 :]
        f_fd = np.concatenate([pos, neg])
        y = np.fft.ifft(f_fd) * self.N_dec
        return y[self.N_dec - self.olen :].astype(np.complex64)


class GoldenAM:
    """demod_am per-sample loop (am.c:51-75)."""

    def __init__(self, dsamprate, headroom_db=-15.0, recovery_db_s=50.0,
                 hangtime_s=0.0):
        samptime = 1.0 / dsamprate
        self.recovery = F32(10 ** (recovery_db_s * samptime / 20.0))
        self.hangmax = int(hangtime_s / samptime)
        self.headroom = F32(10 ** (headroom_db / 20.0))
        self.gain = F32(10 ** (80 / 20.0))
        self.hang = 0
        self.dc = F32(0.0)
        self.dc_coeff = F32(1e-4)

    def demod(self, bb):
        out = np.empty(len(bb), F32)
        for n, s in enumerate(bb):
            samp = F32(np.sqrt(s.real * s.real + s.imag * s.imag))
            self.dc = F32(self.dc + self.dc_coeff * (samp - self.dc))
            if self.gain * self.dc > self.headroom:          # am.c:66
                self.gain = F32(self.headroom / self.dc)
                self.hang = self.hangmax
            elif self.hang != 0:
                self.hang -= 1
            else:
                self.gain = F32(self.gain * self.recovery)
            out[n] = F32((samp - self.dc) * self.gain)
        return out


class GoldenFM:
    """demod_fm loop (fm.c:72-173): SNR squelch, blanking discriminator,
    de-emphasis audio slave."""

    def __init__(self, dsamprate, low, high, L_dec, M_dec,
                 headroom_db=-15.0, beta=3.0):
        self.dsamprate = dsamprate
        headroom = 10 ** (headroom_db / 20.0)
        self.gain = F32(headroom * (1 / np.pi) * dsamprate / abs(low - high))
        am = GoldenMaster(L_dec, M_dec, real=True)
        AN = am.N
        fg = 10.0 / AN
        j = np.arange(AN // 2 + 1)
        f = j * dsamprate / AN
        aresp = np.where((f >= 300) & (f <= 6000),
                         fg * 300.0 / np.maximum(f, 1.0), 0.0).astype(complex)
        resp = window_rfilter(L_dec, M_dec, aresp, beta).astype(np.complex64)
        self.audio_master = am
        self.audio_slave = GoldenSlave(am, resp, 1, out_real=True)
        self.state = np.complex64(1.0)
        self.lastaudio = F32(0.0)
        self.snr_below = 0

    def demod(self, bb):
        n = len(bb)
        sampsq = bb.real**2 + bb.imag**2
        bb_power = float(np.sum(sampsq)) / (2 * n)
        amp = np.sqrt(sampsq)
        avg_amp = float(np.sum(amp)) / (np.sqrt(2.0) * n)
        variance = bb_power - avg_amp * avg_amp           # fm.c:101
        snr = max(0.0, avg_amp * avg_amp / (2 * variance) - 1.0) \
            if variance > 0 else 0.0
        if snr > 2.0:
            self.snr_below = 0
        else:
            self.snr_below = min(self.snr_below + 1, 1000)
        samples = np.zeros(n, F32)
        if self.snr_below < 2:
            min_ampl = 0.55 * 0.55 * avg_amp * avg_amp
            for i in range(n):
                s = bb[i]
                if sampsq[i] > min_ampl:
                    v = F32(np.angle(s * self.state))
                    self.lastaudio = v
                    self.state = np.conj(s)
                    samples[i] = v
                else:
                    samples[i] = self.lastaudio
        else:
            self.state = np.complex64(0.0)
            self.lastaudio = F32(0.0)
        fd = self.audio_master.execute(samples)
        audio = self.audio_slave.execute(fd) * self.gain
        return audio.astype(F32)


class GoldenLinear:
    """demod_linear without PLL (linear.c:247-300): per-sample AGC, mono."""

    def __init__(self, dsamprate, headroom_db=-15.0, recovery_db_s=6.0,
                 hangtime_s=1.1):
        samptime = 1.0 / dsamprate
        self.recovery = F32(10 ** (recovery_db_s * samptime / 20.0))
        self.hangmax = int(hangtime_s / samptime)
        self.headroom = F32(10 ** (headroom_db / 20.0))
        self.gain = F32(10 ** (100 / 20.0))
        self.hang = 0

    def demod(self, bb):
        out = np.empty(len(bb), F32)
        for n, s in enumerate(bb):
            amplitude = F32(np.sqrt(s.real * s.real + s.imag * s.imag))
            if amplitude * self.gain > self.headroom:      # linear.c:271
                self.gain = F32(self.headroom / amplitude)
                self.hang = self.hangmax
            elif self.hang != 0:
                self.hang -= 1
            else:
                self.gain = F32(self.gain * self.recovery)
            out[n] = F32(s.real * self.gain)               # mono = I
        return out


class GoldenReceiver:
    """proc_samples + demod thread, single channel (radio.c:41-147)."""

    def __init__(self, mode, samprate=192000, L=3840, M=4353, freq=0.0):
        from ka9q_sdr_tpu.utils.modes import DEFAULT_MODES

        md = DEFAULT_MODES[mode.upper()]
        self.master = GoldenMaster(L, M)
        decimate = samprate // 48000
        dsr = samprate / decimate
        spec = SlaveSpec(MasterSpec(L, M, FilterType.COMPLEX), decimate,
                         FilterType.COMPLEX)
        resp = set_filter_response(spec, md.low / dsr, md.high / dsr, 3.0)
        self.slave = GoldenSlave(self.master, resp, decimate)
        self.lo2_freq = -freq / samprate    # cycles/sample
        self.lo2_phase = 0.0                # float64 phasor (osc.c)
        if md.demod == "AM":
            self.demod = GoldenAM(dsr, recovery_db_s=md.recovery_rate,
                                  hangtime_s=md.hangtime)
        elif md.demod == "FM":
            self.demod = GoldenFM(dsr, md.low, md.high, L // decimate,
                                  (M - 1) // decimate + 1)
        else:
            self.demod = GoldenLinear(dsr, recovery_db_s=md.recovery_rate,
                                      hangtime_s=md.hangtime)

    def process(self, iq):
        n = len(iq)
        k = np.arange(n)
        lo = np.exp(2j * np.pi * (self.lo2_phase + k * self.lo2_freq))
        self.lo2_phase = (self.lo2_phase + n * self.lo2_freq) % 1.0
        mixed = (iq * lo).astype(np.complex64)
        fd = self.master.execute(mixed)
        bb = self.slave.execute(fd)
        return self.demod.demod(bb)


class GoldenSlaveCrossConj(GoldenSlave):
    """CROSS_CONJ (ISB) slave: complex in, cross-conjugated out
    (filter.c:225-249)."""

    def execute(self, fdomain):
        h = self.N_dec // 2
        pos = self.response[: h + 1] * fdomain[: h + 1]
        neg = self.response[h + 1 :] * fdomain[self.m.N - h + 1 :]
        f_fd = np.concatenate([pos, neg]).astype(np.complex64)
        # ISB trick (filter.c:239-249)
        for p in range(1, h):
            dn = self.N_dec - p
            a, b = f_fd[p], f_fd[dn]
            f_fd[p] = a + np.conj(b)
            f_fd[dn] = b - np.conj(a)
        y = np.fft.ifft(f_fd) * self.N_dec
        return y[self.N_dec - self.olen :].astype(np.complex64)


class GoldenLinearShift(GoldenLinear):
    """Linear demod with the post-AGC CW shift oscillator
    (linear.c:283-289) and stereo option."""

    def __init__(self, dsamprate, shift_hz, mono=True, **kw):
        super().__init__(dsamprate, **kw)
        self.shift_freq = shift_hz / dsamprate
        self.shift_phase = 0.0
        self.mono = mono

    def demod(self, bb):
        out = np.empty(len(bb) if self.mono else (len(bb), 2), F32)
        for n, s in enumerate(bb):
            amplitude = F32(np.sqrt(s.real * s.real + s.imag * s.imag))
            if amplitude * self.gain > self.headroom:
                self.gain = F32(self.headroom / amplitude)
                self.hang = self.hangmax
            elif self.hang != 0:
                self.hang -= 1
            else:
                self.gain = F32(self.gain * self.recovery)
            v = s * self.gain
            if self.shift_freq != 0.0:
                lo = np.exp(2j * np.pi * self.shift_phase)
                self.shift_phase = (self.shift_phase + self.shift_freq) % 1.0
                v = v * lo
            if self.mono:
                out[n] = F32(v.real)
            else:
                out[n, 0] = F32(v.real)
                out[n, 1] = F32(v.imag)
        return out
