"""Native RTP engine tests: correctness vs the Python transport, gap
zero-fill, and throughput sanity."""

import time
import threading

import numpy as np
import pytest

from ka9q_sdr_tpu.native import NATIVE_AVAILABLE

pytestmark = pytest.mark.skipif(
    not NATIVE_AVAILABLE, reason="no C++ toolchain"
)


def test_roundtrip_data_exact():
    from ka9q_sdr_tpu.native import RTPReceiver, RTPSender

    rx = RTPReceiver("239.77.1.1", 5504, block_len=3840)
    tx = RTPSender("239.77.1.1", 5504, samprate=192000, ttl=0)
    n = 3840 * 4
    iq = np.zeros(2 * n, np.int16)
    iq[0::2] = (np.arange(n) % 777).astype(np.int16)
    iq[1::2] = -(np.arange(n) % 333).astype(np.int16)
    tx.send(iq, realtime=False)
    blocks = []
    for _ in range(4):
        b = rx.get_block(2000)
        assert b is not None
        blocks.append(b)
    got = np.concatenate(blocks)
    assert np.allclose(got[:, 0], (np.arange(n) % 777) / 32767.0, atol=1e-7)
    assert np.allclose(got[:, 1], -(np.arange(n) % 333) / 32767.0, atol=1e-7)
    assert rx.stats()["drops"] == 0
    rx.close()
    tx.close()


def test_gap_zero_fill():
    """A dropped packet must appear as zeros, preserving sample timing
    (the rtp_process semantics, multicast.c:305-340)."""
    from ka9q_sdr_tpu.native import RTPReceiver
    from ka9q_sdr_tpu.net.multicast import setup_mcast
    from ka9q_sdr_tpu.net.rtp import RTPHeader, IQ_PT

    rx = RTPReceiver("239.77.1.2", 5504, block_len=720, skip_legacy=False)
    tx = setup_mcast("239.77.1.2:5504", output=True, ttl=0)
    payload = np.full(480, 1000, np.int16).astype("<i2").tobytes()  # 240 samp
    for seq, ts in ((0, 0), (1, 240), (3, 720)):   # seq 2 lost
        hdr = RTPHeader(type=IQ_PT, seq=seq, timestamp=ts, ssrc=5)
        tx.send(hdr.to_bytes() + payload)
    b = rx.get_block(2000)
    assert b is not None
    scale = 1000 / 32767.0
    assert np.allclose(b[:480, 0], scale)        # packets 0,1
    assert np.all(b[480:720, 0] == 0.0)          # the hole
    s = rx.stats()
    assert s["drops"] == 1 and s["gap_samples"] == 240
    rx.close()


def test_throughput_exceeds_flagship_rate():
    """Full tx->rx path must beat 24.576 Msps with margin."""
    from ka9q_sdr_tpu.native import RTPReceiver, RTPSender

    L = 122880
    rx = RTPReceiver("239.77.1.3", 5504, block_len=L, ring_blocks=64)
    tx = RTPSender("239.77.1.3", 5504, samprate=24576000, ttl=0)
    nblocks = 40
    iq = np.zeros(2 * L * nblocks, np.int16)
    done = threading.Event()

    def drain():
        got = 0
        while got < nblocks:
            if rx.get_block(2000) is None:
                break
            got += 1
        done.set()

    t = threading.Thread(target=drain)
    t.start()
    t0 = time.perf_counter()
    tx.send(iq, pkt_samples=1440, realtime=False)
    done.wait(20)
    dt = time.perf_counter() - t0
    rate = nblocks * L / dt
    assert rx.stats()["drops"] == 0
    assert rate > 24.576e6, f"only {rate/1e6:.1f} Msps"
    rx.close()
    tx.close()


def test_pcm_fanout_semantics():
    """Native PCM fan-out: per-channel SSRC/seq/timestamp, big-endian
    payloads, silence suppression with advancing timestamps, and the
    talk-spurt marker (audio.c:51-61,102-113 semantics batched)."""
    import select as _select

    from ka9q_sdr_tpu.native import PCMFanoutSender
    from ka9q_sdr_tpu.net.multicast import setup_mcast
    from ka9q_sdr_tpu.net.rtp import RTPHeader

    grp, port = "239.77.3.1", 5520
    rx = setup_mcast(f"{grp}:{port}", output=False)
    tx = PCMFanoutSender(grp, port, ttl=0, ssrc_base=100, max_channels=16)

    L = 960
    tone = (1000 * np.sin(2 * np.pi * 700 * np.arange(L) / 48000)).astype(
        np.int16
    )
    silent = np.zeros(L, np.int16)

    def recv_all():
        pkts = []
        while True:
            r, _, _ = _select.select([rx], [], [], 0.3)
            if not r:
                return pkts
            data = rx.recv(9000)
            hdr, off = RTPHeader.from_bytes(data)
            pkts.append((hdr, data[off:]))

    # block 1: channel 5 active, channel 7 silent
    n = tx.send_block(np.stack([tone, silent]),
                      np.array([5, 7], np.int32), pkt_samples=480)
    assert n == 2          # 960 samples -> two 480-sample packets
    pkts = recv_all()
    assert len(pkts) == 2
    h0, d0 = pkts[0]
    assert h0.type == 11                  # PCM mono PT
    assert h0.ssrc == 105                 # base + channel
    assert h0.marker                      # talk-spurt start
    assert h0.timestamp == 0
    payload = np.frombuffer(d0, ">i2")
    np.testing.assert_array_equal(payload, tone[:480])
    h1, _ = pkts[1]
    assert not h1.marker and h1.timestamp == 480 and h1.seq == 1

    # block 2: channel 5 goes silent, channel 7 starts talking — its
    # timestamp must reflect the silent first block (clock advanced)
    n = tx.send_block(np.stack([silent, tone]),
                      np.array([5, 7], np.int32), pkt_samples=480)
    assert n == 2
    pkts = recv_all()
    assert len(pkts) == 2
    h, _ = pkts[0]
    assert h.ssrc == 107 and h.marker
    assert h.timestamp == L              # one silent block's worth
    assert h.seq == 0                    # first packet ever for ch 7

    # block 3: channel 5 resumes -> marker again, timestamp = 2 blocks
    n = tx.send_block(tone[None, :], np.array([5], np.int32),
                      pkt_samples=480)
    pkts = recv_all()
    h, _ = pkts[0]
    assert h.ssrc == 105 and h.marker and h.timestamp == 2 * L
    assert h.seq == 2                    # two packets were sent in block 1

    tx.close()
    rx.close()


def test_bankd_native_fanout_end_to_end():
    """bankd routes bank PCM through the native fan-out: packets arrive
    with per-channel SSRCs and decode to the demodulated audio."""
    import select as _select

    from ka9q_sdr_tpu.apps.bankd import BankDaemon, build_parser
    from ka9q_sdr_tpu.net.multicast import setup_mcast
    from ka9q_sdr_tpu.net.rtp import RTPHeader

    grp = "239.77.4.1:5004"
    rx = setup_mcast(grp, output=False)
    args = build_parser().parse_args(
        ["-R", grp, "-m", "AM", "--channels", "4",
         "-r", "1536000", "--L", "30720", "--M", "34817", "-T", "0"]
    )
    fs, Lw = 1.536e6, 30720
    usable = 0.9 * fs
    freqs = list(np.linspace(-usable / 2, usable / 2, 4, endpoint=False))
    d = BankDaemon(args, freqs)
    assert d.native_pcm is not None

    f1 = d.bank.freqs[1]
    for b in range(3):
        tt = (b * Lw + np.arange(Lw)) / fs
        iq = (0.4 * (1 + 0.5 * np.sin(2 * np.pi * 400 * tt))
              * np.exp(2j * np.pi * f1 * tt))
        xi = np.empty((Lw, 2), np.int16)
        xi[:, 0] = np.clip(iq.real * 32767, -32768, 32767)
        xi[:, 1] = np.clip(iq.imag * 32767, -32768, 32767)
        d.process_block(xi)
    d.flush()

    got = {}
    while True:
        r, _, _ = _select.select([rx], [], [], 0.3)
        if not r:
            break
        data = rx.recv(9000)
        hdr, off = RTPHeader.from_bytes(data)
        got.setdefault(hdr.ssrc, []).append(
            np.frombuffer(data[off:], ">i2")
        )
    assert got, "no PCM packets arrived"
    # channel 1 (ssrc 2) carries the AM audio
    assert 2 in got, sorted(got)
    audio = np.concatenate(got[2]).astype(np.float32) / 32767.0
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    f = np.fft.rfftfreq(len(audio), 1 / 48000)
    peak = f[np.argmax(spec[5:]) + 5]
    assert abs(peak - 400.0) < 20.0, peak
    rx.close()


def test_pcm_fanout_marker_after_compaction_absence():
    """A channel omitted from the compacted active set (not a silent row,
    simply absent) must still resume with the talk-spurt marker and an
    advanced timestamp."""
    import select as _select

    from ka9q_sdr_tpu.native import PCMFanoutSender
    from ka9q_sdr_tpu.net.multicast import setup_mcast
    from ka9q_sdr_tpu.net.rtp import RTPHeader

    grp, port = "239.77.3.2", 5522
    rx = setup_mcast(f"{grp}:{port}", output=False)
    tx = PCMFanoutSender(grp, port, ttl=0, ssrc_base=200, max_channels=8)
    L = 480
    tone = (1000 * np.sin(2 * np.pi * 700 * np.arange(L) / 48000)).astype(
        np.int16
    )

    def recv_all():
        pkts = []
        while True:
            r, _, _ = _select.select([rx], [], [], 0.3)
            if not r:
                return pkts
            data = rx.recv(9000)
            hdr, off = RTPHeader.from_bytes(data)
            pkts.append(hdr)

    tx.send_block(tone[None, :], np.array([3], np.int32))
    h = recv_all()[0]
    assert h.marker and h.timestamp == 0
    # channel 3 drops out of the active set entirely for two blocks
    tx.send_block(np.empty((0, L), np.int16), np.empty((0,), np.int32))
    tx.send_block(np.empty((0, L), np.int16), np.empty((0,), np.int32))
    assert recv_all() == []
    # resume: marker set, timestamp reflects the two absent blocks
    tx.send_block(tone[None, :], np.array([3], np.int32))
    h = recv_all()[0]
    assert h.marker, "marker lost after compaction absence"
    assert h.timestamp == 3 * L
    assert h.seq == 1
    tx.close()
    rx.close()


def test_pcm_fanout_rejects_bad_pkt_samples():
    from ka9q_sdr_tpu.native import PCMFanoutSender

    tx = PCMFanoutSender("239.77.3.3", 5524, ttl=0, max_channels=2)
    pcm = np.zeros((1, 960), np.int16)
    ids = np.array([0], np.int32)
    assert tx.send_block(pcm, ids, pkt_samples=0) == -1
    # oversize request is clamped, not a crash: 960 nonzero samples
    pcm1 = np.ones((1, 960), np.int16)
    assert tx.send_block(pcm1, ids, pkt_samples=100000) >= 1
    tx.close()


def test_timestamp_jump_resyncs_stream():
    """A too-big timestamp jump (same SSRC — e.g. a producer restart that
    kept its SSRC but picked a new timestamp origin) drops that packet but
    must RE-SYNC the expected timestamp, exactly like rtp_process
    (multicast.c:334-339) + the radio.c:77-79 drop: the next packet flows.
    Regression: the engine used to return before updating, blacking out
    ingest until int32 wrap."""
    from ka9q_sdr_tpu.native import RTPReceiver
    from ka9q_sdr_tpu.net.multicast import setup_mcast
    from ka9q_sdr_tpu.net.rtp import RTPHeader, IQ_PT

    rx = RTPReceiver("239.77.1.9", 5504, block_len=240, skip_legacy=False)
    tx = setup_mcast("239.77.1.9:5504", output=True, ttl=0)
    payload = np.full(480, 2000, np.int16).astype("<i2").tobytes()  # 240 samp
    # establish the stream, then jump the clock far beyond MAX_TIME_STEP
    for seq, ts in ((0, 0), (1, 240), (2, 0x40000000), (3, 0x40000000 + 240)):
        hdr = RTPHeader(type=IQ_PT, seq=seq, timestamp=ts, ssrc=9)
        tx.send(hdr.to_bytes() + payload)
    blocks = []
    for _ in range(3):
        b = rx.get_block(2000)
        if b is None:
            break
        blocks.append(b)
    # packets 0, 1 and 3 land (2 is the dropped jump); no zero-fill blocks
    assert len(blocks) == 3, f"stream stalled after jump: got {len(blocks)}"
    scale = 2000 / 32767.0
    for b in blocks:
        assert np.allclose(b[:, 0], scale)
    rx.close()


def test_native_rx_bad_group_fails_loudly():
    """(r4 review) A garbage group string must raise at create: the old
    INADDR_ANY fallback left the daemon silently deaf (failed join) or
    cross-delivered every stream on the port.  Same loud contract as
    net/multicast.py; hostnames still resolve host-side."""
    from ka9q_sdr_tpu.native import RTPReceiver

    with pytest.raises(OSError):
        RTPReceiver("not.a.real.host.invalid", 5504, block_len=240)
    with pytest.raises(OSError):
        # resolvable but not bindable as a local destination filter
        RTPReceiver("0.0.0.1", 5504, block_len=240)


def test_native_rx_strips_rtp_padding():
    """(r4 review) A padded I/Q packet (RFC 3550 pad bit + trailing count
    byte) must contribute only its real samples — the engine used to
    decode the padding as I/Q and advance the clock by it, desyncing the
    stream (the Python path strips it via rtp_payload)."""
    from ka9q_sdr_tpu.native import RTPReceiver
    from ka9q_sdr_tpu.net.multicast import setup_mcast
    from ka9q_sdr_tpu.net.rtp import RTPHeader, IQ_PT

    rx = RTPReceiver("239.77.1.13", 5506, block_len=240, skip_legacy=False)
    tx = setup_mcast("239.77.1.13:5506", output=True, ttl=0)
    payload = np.full(240, 2000, np.int16).astype("<i2").tobytes()  # 120 samp
    pad = b"\x00\x00\x00\x04"                 # 4 pad bytes, count included
    for seq in range(4):
        hdr = RTPHeader(type=IQ_PT, seq=seq, timestamp=seq * 120, ssrc=13,
                        pad=True)
        tx.send(hdr.to_bytes() + payload + pad)
    blocks = []
    for _ in range(2):
        b = rx.get_block(2000)
        if b is None:
            break
        blocks.append(b)
    # 4 x 120 padded samples = 2 dense blocks, no gaps/dupes, all 2000s
    assert len(blocks) == 2, f"padded stream desynced: got {len(blocks)}"
    scale = 2000 / 32767.0
    for b in blocks:
        assert np.allclose(b[:, 0], scale) and np.allclose(b[:, 1], scale)
    stats = rx.stats()
    assert stats["drops"] == 0 and stats["dupes"] == 0
    assert stats["gap_samples"] == 0
    rx.close()


def test_rtp_parser_differential_fuzz():
    """The native wire parser and net.rtp.RTPHeader.from_bytes must agree
    on every datagram: same accept/reject verdict, identical header
    fields + payload offset when accepted, and the same padding-strip
    semantics as rtp_payload (incl. the bogus-pad-count -> empty-payload
    tolerance).  Random garbage plus structured mutations (flags, CSRC
    counts, extensions, padding, truncations)."""
    import struct
    from ka9q_sdr_tpu.native import parse_probe
    from ka9q_sdr_tpu.net.rtp import RTPHeader, rtp_payload

    rng = np.random.default_rng(2809)

    def python_parse(pkt: bytes):
        try:
            h, off = RTPHeader.from_bytes(pkt)
        except ValueError:
            return None
        pad_len = len(pkt) - off - len(rtp_payload(h, pkt, off))
        return (h.version, h.type, h.seq, h.timestamp, h.ssrc,
                int(h.marker), off, pad_len)

    cases = []
    # pure garbage, every length 0..40 plus some larger
    for n in list(range(41)) + [64, 200, 1500]:
        for _ in range(20):
            cases.append(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    # structured: valid-ish base headers with mutated flag bytes
    for _ in range(2000):
        cc = int(rng.integers(0, 16))
        ext = int(rng.integers(0, 2))
        pad = int(rng.integers(0, 2))
        b0 = (2 << 6) | (pad << 5) | (ext << 4) | cc
        b1 = int(rng.integers(0, 256))
        hdr = struct.pack(">BBHII", b0, b1,
                          int(rng.integers(0, 1 << 16)),
                          int(rng.integers(0, 1 << 32)),
                          int(rng.integers(0, 1 << 32)))
        body = rng.integers(0, 256,
                            int(rng.integers(0, 80)), dtype=np.uint8
                            ).tobytes()
        pkt = hdr + body
        # random truncation half the time
        if rng.integers(0, 2):
            pkt = pkt[: int(rng.integers(0, len(pkt) + 1))]
        cases.append(pkt)

    for pkt in cases:
        ours = python_parse(pkt)
        native = parse_probe(pkt)
        assert ours == native, (
            f"parser divergence on {pkt.hex()}: python={ours} "
            f"native={native}"
        )


def test_native_opus_differential_vs_python():
    """The native transcoder (opus_tx engine) must emit byte-identical
    Opus RTP to the Python path (audio/transcode.py) for the same input
    stream: session demux, gap zero-fill, marker/long-gap encoder resets,
    dupe drops, mono duplication, ragged-tail truncation, DTX suppression
    — all opus.c:246-397 semantics, both sides of one libopus."""
    import select as _select

    from ka9q_sdr_tpu.audio.opus_codec import OPUS_AVAILABLE
    if not OPUS_AVAILABLE:
        pytest.skip("libopus absent")
    from ka9q_sdr_tpu.audio.transcode import OpusTranscoder
    from ka9q_sdr_tpu.native import NativeOpusTranscoder
    from ka9q_sdr_tpu.net.multicast import setup_mcast
    from ka9q_sdr_tpu.net.rtp import RTPHeader, PCM_MONO_PT, PCM_STEREO_PT

    in_grp, in_port = "239.77.4.1", 5530
    out_grp, out_port = "239.77.4.2", 5531
    native = NativeOpusTranscoder(in_grp, out_grp, in_port, out_port,
                                  bitrate=32000, frame_ms=20.0, dtx=True)
    rx = setup_mcast(f"{out_grp}:{out_port}", output=False)
    tx = setup_mcast(f"{in_grp}:{in_port}", output=True, ttl=0)

    py_out = []
    py_tc = OpusTranscoder(send=py_out.append, bitrate=32000, frame_ms=20.0,
                           dtx=True)

    t = np.arange(480) / 48000.0
    tone_a = (8000 * np.sin(2 * np.pi * 440 * t)).astype(">i2").tobytes()
    tone_b_l = (6000 * np.sin(2 * np.pi * 600 * t)).astype(np.int16)
    tone_b_r = (6000 * np.sin(2 * np.pi * 800 * t)).astype(np.int16)
    tone_b = np.stack([tone_b_l, tone_b_r], -1).astype(">i2").tobytes()
    silence = np.zeros(480, ">i2").tobytes()

    stream = []
    # session A: mono 10 ms packets; drop seq 4 (small gap -> zero fill)
    seq, ts = 0, 0
    for i in range(12):
        if i == 4:
            seq += 1
            ts += 480
        stream.append(RTPHeader(type=PCM_MONO_PT, seq=seq, timestamp=ts,
                                ssrc=1).to_bytes() + tone_a)
        seq += 1
        ts += 480
    # a stale duplicate (old seq): both sides must drop it
    stream.append(RTPHeader(type=PCM_MONO_PT, seq=2, timestamp=960,
                            ssrc=1).to_bytes() + tone_a)
    # marker restart mid-stream with a big timestamp jump (talk spurt)
    ts += 480 * 600
    for i in range(6):
        stream.append(RTPHeader(type=PCM_MONO_PT, seq=seq, timestamp=ts,
                                ssrc=1, marker=(i == 0)).to_bytes() + tone_a)
        seq += 1
        ts += 480
    # sustained silence so DTX engages identically on both sides
    for i in range(40):
        stream.append(RTPHeader(type=PCM_MONO_PT, seq=seq, timestamp=ts,
                                ssrc=1).to_bytes() + silence)
        seq += 1
        ts += 480
    # session B: stereo, interleaved with A by construction order; one
    # ragged payload (trailing odd bytes truncated, opus.c's integer
    # frame-count division)
    seq_b, ts_b = 100, 5000
    for i in range(10):
        payload = tone_b + (b"\x7f" if i == 3 else b"")
        stream.append(RTPHeader(type=PCM_STEREO_PT, seq=seq_b,
                                timestamp=ts_b, ssrc=2).to_bytes() + payload)
        seq_b += 1
        ts_b += 480
    # non-PCM payload type: ignored by both
    stream.append(RTPHeader(type=97, seq=0, timestamp=0, ssrc=3).to_bytes()
                  + tone_a)

    sender = ("10.1.2.3", 4444)
    for pkt in stream:
        tx.send(pkt)
        py_tc.feed_packet(pkt, sender)

    # drain the native output until it goes quiet
    native_pkts = []
    deadline = time.time() + 10.0
    quiet = 0
    while time.time() < deadline and quiet < 8:
        r, _, _ = _select.select([rx], [], [], 0.25)
        if not r:
            quiet += 1
            continue
        quiet = 0
        data, _ = rx.recvfrom(9000)
        native_pkts.append(data)
    native.close()
    rx.close()
    tx.close()

    def by_ssrc(pkts):
        out = {}
        for p in pkts:
            h, _ = RTPHeader.from_bytes(p)
            out.setdefault(h.ssrc, []).append(p)
        return out

    py_by, nat_by = by_ssrc(py_out), by_ssrc(native_pkts)
    assert set(py_by) == set(nat_by), (
        f"session sets differ: py={sorted(py_by)} native={sorted(nat_by)}"
    )
    for ssrc in py_by:
        assert len(py_by[ssrc]) == len(nat_by[ssrc]), (
            f"ssrc {ssrc}: {len(py_by[ssrc])} py vs "
            f"{len(nat_by[ssrc])} native packets"
        )
        for i, (a, b) in enumerate(zip(py_by[ssrc], nat_by[ssrc])):
            assert a == b, f"ssrc {ssrc} packet {i} differs"
    # sanity: the stream actually exercised the paths
    assert len(py_out) > 10
