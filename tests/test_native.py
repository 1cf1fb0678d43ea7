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
