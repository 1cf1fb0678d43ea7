"""Opus transcoding and playout mixer tests (opus.c / monitor.c parity)."""

import numpy as np
import pytest

from ka9q_sdr_tpu.audio.opus_codec import OPUS_AVAILABLE
from ka9q_sdr_tpu.audio.playout import Mixer, SAMPRATE, START_DELAY
from ka9q_sdr_tpu.audio.transcode import OpusTranscoder
from ka9q_sdr_tpu.net.rtp import RTPHeader, PCM_MONO_PT, PCM_STEREO_PT, OPUS_PT

needs_opus = pytest.mark.skipif(not OPUS_AVAILABLE, reason="libopus missing")


def _pcm_packet(seq, ts, ssrc, audio, stereo=False, marker=False):
    pcm = np.clip(audio * 32767, -32768, 32767).astype(">i2")
    hdr = RTPHeader(
        type=PCM_STEREO_PT if stereo else PCM_MONO_PT,
        seq=seq, timestamp=ts, ssrc=ssrc, marker=marker,
    )
    return hdr.to_bytes() + pcm.tobytes()


class TestOpus:
    @needs_opus
    def test_roundtrip_through_transcoder(self):
        """PCM -> Opus packets -> decode -> recognisable tone."""
        from ka9q_sdr_tpu.audio.opus_codec import OpusDecoder

        packets = []
        tc = OpusTranscoder(send=packets.append, bitrate=64000)
        t = np.arange(SAMPRATE) / SAMPRATE   # 1 s of 440 Hz
        tone = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
        for i in range(0, SAMPRATE, 480):
            pkt = _pcm_packet(i // 480, i, 7, tone[i : i + 480],
                              marker=(i == 0))
            tc.feed_packet(pkt)
        assert len(packets) >= 45   # ~50 x 20 ms frames
        hdr, off = RTPHeader.from_bytes(packets[0])
        assert hdr.type == OPUS_PT and hdr.marker
        dec = OpusDecoder()
        audio = np.concatenate(
            [dec.decode(p[RTPHeader.from_bytes(p)[1]:]) for p in packets]
        )
        seg = audio[len(audio) // 2:, 0]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f = np.fft.rfftfreq(len(seg), 1 / SAMPRATE)
        assert abs(f[np.argmax(spec[5:]) + 5] - 440) < 5

    @needs_opus
    def test_dtx_suppresses_silence(self):
        packets = []
        tc = OpusTranscoder(send=packets.append, dtx=True)
        silence = np.zeros(480, np.float32)
        for i in range(200):   # 2 s of silence
            tc.feed_packet(_pcm_packet(i, i * 480, 9, silence))
        # DTX: only a few comfort-noise/none packets instead of ~100
        assert len(packets) < 20


class TestMixer:
    def test_playout_delay_and_mix(self):
        mixer = Mixer()
        tone = 0.25 * np.sin(
            2 * np.pi * 1000 * np.arange(480) / SAMPRATE
        ).astype(np.float32)
        mixer.feed_packet(_pcm_packet(0, 0, 1, tone, marker=True))
        # audio is placed START_DELAY after the read pointer
        head = mixer.read(START_DELAY)
        assert np.all(head == 0.0)
        audio = mixer.read(480)
        assert np.max(np.abs(audio)) > 0.1
        # mono feeds both channels equally
        assert np.allclose(audio[:, 0], audio[:, 1])

    def test_two_sessions_mix_additively(self):
        mixer = Mixer()
        a = 0.25 * np.ones(480, np.float32)
        mixer.feed_packet(_pcm_packet(0, 0, 1, a, marker=True))
        mixer.feed_packet(_pcm_packet(0, 0, 2, a, marker=True))
        mixer.read(START_DELAY)
        audio = mixer.read(480)
        # linear centre pan (monitor.c:440-441): each channel gets
        # gain*(1±pan)/2 = 0.5, so each session contributes 0.25*0.5
        expect = 2 * 0.25 * 0.5
        assert abs(audio[10, 0] - expect) < 0.01

    def test_late_packet_bumps_playout(self):
        mixer = Mixer()
        tone = np.ones(480, np.float32) * 0.1
        mixer.feed_packet(_pcm_packet(0, 0, 1, tone, marker=True))
        sess = mixer.sessions[1]
        p0 = sess.playout
        # drain far past this packet, then send the "next" timestamp (late)
        mixer.read(START_DELAY + 48000)
        mixer.feed_packet(_pcm_packet(1, 480, 1, tone))
        assert sess.playout == p0 + SAMPRATE // 1000
        assert sess.lates == 1

    def test_stereo_pan(self):
        mixer = Mixer()
        st = np.zeros((480, 2), np.float32)
        st[:, 0] = 0.5
        st[:, 1] = 0.5
        mixer.feed_packet(_pcm_packet(0, 0, 3, st.reshape(-1), stereo=True,
                                      marker=True))
        mixer.sessions[3].pan = -1.0   # full left
        mixer.feed_packet(_pcm_packet(1, 480, 3, st.reshape(-1), stereo=True))
        mixer.read(START_DELAY)
        a = mixer.read(960)
        # second packet (full left pan): right channel ~0
        assert np.max(np.abs(a[500:900, 0])) > 0.3
        assert np.max(np.abs(a[520:900, 1])) < 0.01

    def test_malformed_payloads_do_not_crash(self):
        """Hostile datagrams must be tolerated, not crash the daemon
        (regression: odd-length PCM payloads raised in np.frombuffer,
        ragged stereo in reshape, corrupt Opus in the decoder)."""
        mixer = Mixer()
        base = RTPHeader(type=PCM_MONO_PT, seq=0, timestamp=0, ssrc=4)
        mixer.feed_packet(base.to_bytes() + b"\x01")            # odd mono
        st = RTPHeader(type=PCM_STEREO_PT, seq=0, timestamp=0, ssrc=5)
        mixer.feed_packet(st.to_bytes() + b"\x01\x02\x03\x04\x05\x06")
        if OPUS_AVAILABLE:
            op = RTPHeader(type=OPUS_PT, seq=0, timestamp=0, ssrc=6)
            mixer.feed_packet(op.to_bytes() + b"\xff" * 7)      # garbage
        tc = OpusTranscoder(send=lambda d: None)
        tc.feed_packet(base.to_bytes() + b"\x01")
        # a sane packet still mixes afterwards
        mixer.feed_packet(_pcm_packet(1, 240, 4,
                                      0.5 * np.ones(240, np.float32),
                                      marker=True))
        mixer.read(START_DELAY)
        assert np.max(np.abs(mixer.read(240))) > 0.1

    def test_rtp_padding_stripped(self):
        """The pad bit's trailing bytes are not audio (monitor.c:312-315):
        2 pad bytes on a mono PCM payload must not add a sample."""
        mixer = Mixer()
        pcm = np.full(240, 8000, ">i2").tobytes()
        hdr = RTPHeader(type=PCM_MONO_PT, seq=0, timestamp=0, ssrc=8,
                        marker=True, pad=True)
        mixer.feed_packet(hdr.to_bytes() + pcm + b"\x7f\x02")   # pad len 2
        mixer.read(START_DELAY)
        a = mixer.read(242)
        assert np.max(np.abs(a[:240])) > 0.1
        assert np.all(a[240:] == 0.0)          # pad bytes not decoded

    def test_marker_resets_playout_delay(self):
        """A talk-spurt start re-anchors AND resets the playout delay to
        100 ms (monitor.c:459) — late bumps must not accumulate into
        permanent latency creep."""
        mixer = Mixer()
        tone = 0.1 * np.ones(480, np.float32)
        mixer.feed_packet(_pcm_packet(0, 0, 1, tone, marker=True))
        sess = mixer.sessions[1]
        mixer.read(START_DELAY + 48000)
        mixer.feed_packet(_pcm_packet(1, 480, 1, tone))   # late -> bump
        assert sess.playout == START_DELAY + SAMPRATE // 1000
        mixer.feed_packet(_pcm_packet(2, 96000, 1, tone, marker=True))
        assert sess.playout == START_DELAY

    @needs_opus
    def test_same_ssrc_switches_pcm_to_opus(self):
        """A session first seen as PCM must still decode when the same
        SSRC switches to Opus (lazy decoder creation, monitor.c:497-504)."""
        from ka9q_sdr_tpu.audio.opus_codec import OpusEncoder

        mixer = Mixer()
        mixer.feed_packet(_pcm_packet(0, 0, 11,
                                      0.2 * np.ones(480, np.float32),
                                      marker=True))
        enc = OpusEncoder()
        frame = 0.4 * np.ones((960, 2), np.float32)
        pkt = enc.encode(frame)         # warm up the encoder
        pkt = enc.encode(frame)
        hdr = RTPHeader(type=OPUS_PT, seq=1, timestamp=96000, ssrc=11,
                        marker=True)
        mixer.feed_packet(hdr.to_bytes() + pkt)
        assert mixer.sessions[11].decoder is not None
        assert mixer.sessions[11].type == OPUS_PT
        mixer.read(START_DELAY)
        assert np.max(np.abs(mixer.read(960))) > 0.05


class TestTranscoderSessions:
    @needs_opus
    def test_marker_reset_reuses_encoder(self):
        """Talk-spurt resets are in-place (OPUS_RESET_STATE, opus.c:253):
        re-creating the encoder leaked its native allocation every
        squelch re-open."""
        tc = OpusTranscoder(send=lambda d: None)
        a = 0.2 * np.ones(480, np.float32)
        tc.feed_packet(_pcm_packet(0, 0, 7, a, marker=True))
        enc0 = next(iter(tc.sessions.values())).encoder
        tc.feed_packet(_pcm_packet(1, 480, 7, a, marker=True))
        assert next(iter(tc.sessions.values())).encoder is enc0

    @needs_opus
    def test_sessions_keyed_by_full_sender(self):
        """Two senders on one IP (different ports) sharing an SSRC stay
        separate sessions (opus.c:287 memcmps the whole sockaddr)."""
        tc = OpusTranscoder(send=lambda d: None)
        a = 0.2 * np.ones(480, np.float32)
        tc.feed_packet(_pcm_packet(0, 0, 7, a), sender=("10.0.0.1", 5004))
        tc.feed_packet(_pcm_packet(0, 0, 7, a), sender=("10.0.0.1", 5006))
        assert len(tc.sessions) == 2


class TestMonitorTUI:
    def test_tui_keeps_pcm_stream_clean(self, tmp_path):
        """monitor --tui attaches curses to the TERMINAL, not stdout: with
        stdout redirected (the documented usage, `--tui > mix.s16`) the
        s16 stream stays byte-clean and the UI's escape sequences land on
        the tty — the reference's portaudio-vs-screen separation
        (monitor.c:360-386 vs 530-733)."""
        import os
        import pty
        import select as sel
        import time

        from ka9q_sdr_tpu.apps import monitor
        from ka9q_sdr_tpu.audio.playout import Mixer

        os.environ.setdefault("TERM", "xterm")
        master, slave = pty.openpty()
        pcm_path = tmp_path / "mix.s16"
        saved = os.dup(1)
        fh = open(pcm_path, "wb")
        os.dup2(fh.fileno(), 1)
        stop = {"quit": False}
        payload = bytes(range(256)) * 8   # arbitrary s16 bytes incl. 0x1b
        try:
            out = monitor._attach_tui(Mixer(), stop,
                                      tty_path=os.ttyname(slave))
            assert out is not None
            time.sleep(0.5)               # let the UI draw frames
            out.write(payload)
            out.flush()
            time.sleep(0.3)
        finally:
            stop["quit"] = True
            time.sleep(0.3)               # UI thread exits + endwin
            os.dup2(saved, 1)
            os.close(saved)
            fh.close()
        assert open(pcm_path, "rb").read() == payload   # PCM byte-clean
        r, _, _ = sel.select([master], [], [], 2.0)
        ui = os.read(master, 65536) if r else b""
        os.close(master)
        os.close(slave)
        assert b"\x1b" in ui              # the UI really drew on the tty

    def test_tui_without_terminal_degrades_gracefully(self, tmp_path):
        """No controlling terminal: --tui is skipped with a note, PCM
        stream untouched (returns None so main uses stdout)."""
        from ka9q_sdr_tpu.apps import monitor
        from ka9q_sdr_tpu.audio.playout import Mixer

        out = monitor._attach_tui(Mixer(), {"quit": False},
                                  tty_path=str(tmp_path / "no-such-tty"))
        assert out is None


def test_monitor_dash_I_group_syntax(tmp_path):
    """monitor.c adds groups with -I (repeatable); ours accepts both the
    positional form and -I, merged."""
    import threading
    import time

    from ka9q_sdr_tpu.apps import monitor
    from ka9q_sdr_tpu.net.multicast import setup_mcast
    from ka9q_sdr_tpu.net.rtp import RTPHeader, PCM_MONO_PT

    G1, G2 = "239.88.7.11:5204", "239.88.7.12:5204"
    out = tmp_path / "mix.s16"
    res = {}

    def run():
        import sys as _s
        old = _s.stdout
        with open(out, "wb") as f:
            class W:  # monitor writes sys.stdout.buffer
                buffer = f
            _s.stdout = W()
            try:
                res["rc"] = monitor.main(["-q", "-I", G1, "-I", G2,
                                          "--seconds", "2"])
            finally:
                _s.stdout = old

    th = threading.Thread(target=run, daemon=True)
    th.start()
    tx1 = setup_mcast(G1, output=True)
    tx2 = setup_mcast(G2, output=True)
    pay = np.full(240, 3000, ">i2").tobytes()
    seq = 0
    deadline = time.time() + 20.0
    while th.is_alive() and time.time() < deadline:
        tx1.send(RTPHeader(type=PCM_MONO_PT, seq=seq, timestamp=seq * 240,
                           ssrc=1).to_bytes() + pay)
        tx2.send(RTPHeader(type=PCM_MONO_PT, seq=seq, timestamp=seq * 240,
                           ssrc=2).to_bytes() + pay)
        seq += 1
        time.sleep(0.005)
        th.join(timeout=0.0)
    th.join(timeout=5.0)
    assert res.get("rc") == 0
    a = np.frombuffer(out.read_bytes(), np.int16)
    # both sessions mixed additively -> more than one session's worth of
    # audio present (each contributes 3000 * 0.5 centre-pan gain)
    assert len(a) > 0 and np.abs(a.astype(np.int32)).max() > 2500
