"""Flagship benchmark: multichannel demodulation throughput on one chip.

Metric: channels x Msamples/sec of wideband I/Q demodulated per chip,
sustained (BASELINE.json).  The reference demodulates ~1 channel from a
0.192 Msps stream per CPU core (BASELINE.md); one v5e chip running the
bank at real time on its native geometry scores n_channels x samprate/1e6.
We report the *achieved* rate: blocks/sec x L x n_channels, which exceeds
real time when the chip has headroom.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    # 1024 channels is the throughput sweet spot on one v5e chip (~2.6 ms
    # per 20 ms block = 7.7x realtime); 256 runs ~3 ms, 2048 ~8 ms.
    n_channels = int(os.environ.get("BENCH_CHANNELS", "1024"))
    # Default bank geometry: 24.576 Msps, N=2^20 FFT, 512:1 to 48 kHz
    samprate = float(os.environ.get("BENCH_SAMPRATE", str(24.576e6)))
    L = int(os.environ.get("BENCH_L", str(491520)))
    M = int(os.environ.get("BENCH_M", str(557057)))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    import jax
    from ka9q_sdr_tpu.models.bank import make_bank_config, ChannelBank

    cfg = make_bank_config(n_channels, "FM", samprate=samprate, L=L, M=M)
    usable = 0.9 * samprate
    freqs = list(np.linspace(-usable / 2, usable / 2, n_channels, endpoint=False))
    bank = ChannelBank(cfg, freqs)

    rng = np.random.default_rng(1)
    # wideband block with a few FM carriers + noise, packed real
    tt = np.arange(L) / samprate
    x = 0.01 * (rng.standard_normal(L) + 1j * rng.standard_normal(L))
    for ch in (3, n_channels // 2, n_channels - 5):
        x += 0.2 * np.exp(2j * np.pi * freqs[ch] * tt)
    x = x.astype(np.complex64)
    # production ingest format: raw int16 pairs, converted on-device
    x_i = np.empty((L, 2), np.int16)
    x_i[:, 0] = np.clip(x.real * 32767, -32768, 32767)
    x_i[:, 1] = np.clip(x.imag * 32767, -32768, 32767)

    for _ in range(warmup):
        audio, diag = bank.process_i16(x_i)
    jax.block_until_ready(audio)

    t0 = time.perf_counter()
    for _ in range(iters):
        audio, diag = bank.process_i16(x_i)
    jax.block_until_ready(audio)
    dt = time.perf_counter() - t0

    sps = iters * L / dt                      # wideband samples/sec achieved
    value = n_channels * sps / 1e6            # channels x Msps
    baseline = 0.192                          # 1 ch x 0.192 Msps per CPU core
    print(
        json.dumps(
            {
                "metric": "channels_x_Msps_demodulated_per_chip",
                "value": round(value, 3),
                "unit": "ch*Msps",
                "vs_baseline": round(value / baseline, 1),
            }
        )
    )
    print(
        f"# {n_channels} ch x {samprate/1e6:.3f} Msps bank: "
        f"{sps/1e6:.2f} Msps achieved ({sps/samprate:.2f}x realtime), "
        f"block {L} in {dt/iters*1e3:.2f} ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
