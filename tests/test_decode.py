"""Digital decode chain tests: AX.25, CRC, AFSK closed loop, APRS."""

import math

import numpy as np
import pytest

from ka9q_sdr_tpu.decode.ax25 import (
    AX25Frame,
    ax25_parse,
    append_crc,
    crc_good,
    encode_callsign,
    get_callsign,
    decode_base91,
    frame_to_tnc2,
)
from ka9q_sdr_tpu.decode.afsk import (
    AFSKDemodulator,
    afsk_modulate,
    hdlc_encode,
    modulate_bits,
)
from ka9q_sdr_tpu.decode.aprs import (
    Station,
    look_angles,
    parse_position,
    parse_timestamp,
    parse_aprs,
)


def build_ui_frame(src="KA9Q-11", dst="APRS", digis=(), info=b"hello"):
    """Assemble a UI frame with valid CRC (test fixture)."""
    hdr = encode_callsign(dst) + encode_callsign(src, last=not digis)
    for i, d in enumerate(digis):
        hdr += encode_callsign(d, last=(i == len(digis) - 1))
    body = hdr + bytes([0x03, 0xF0]) + info
    return append_crc(body)


class TestAX25:
    def test_callsign_roundtrip(self):
        assert get_callsign(encode_callsign("KA9Q-11")) == "KA9Q-11"
        assert get_callsign(encode_callsign("W1AW")) == "W1AW"

    def test_crc(self):
        f = build_ui_frame()
        assert crc_good(f)
        assert not crc_good(f[:-1] + bytes([f[-1] ^ 1]))

    def test_parse(self):
        f = build_ui_frame(src="N0CALL-7", dst="APRS",
                           digis=("WIDE1-1", "WIDE2-2"), info=b"!test")
        p = ax25_parse(f)
        assert p.source == "N0CALL-7"
        assert p.dest == "APRS"
        assert [d[0] for d in p.digipeaters] == ["WIDE1-1", "WIDE2-2"]
        assert p.control == 0x03 and p.type == 0xF0
        assert p.information == b"!test"

    def test_tnc2(self):
        f = build_ui_frame(src="N0CALL", dst="APRS", digis=("WIDE1-1",),
                           info=b">status here")
        s = frame_to_tnc2(ax25_parse(f))
        assert s == "N0CALL>APRS,WIDE1-1:>status here"

    def test_base91(self):
        # '<*e7' from the APRS spec compressed-position example:
        # 27*91^3 + 9*91^2 + 68*91 + 22
        assert decode_base91("<*e7") == 20427156

    def test_tnc2_strips_injection_and_parity(self):
        """Info chars are filtered exactly like aprsfeed.c:228-236:
        parity stripped (c & 0x7f) and CR/LF/NUL dropped ANYWHERE —
        an embedded newline must not let an RF frame inject a second
        line (= a forged packet) into the line-oriented APRS-IS feed."""
        f = build_ui_frame(
            src="N0CALL", dst="APRS",
            info=b"hi\r\nN0CALL-2>APRS:forged\x00\xc1!")
        s = frame_to_tnc2(ax25_parse(f))
        assert s == "N0CALL>APRS:hiN0CALL-2>APRS:forgedA!"
        assert "\r" not in s and "\n" not in s and "\0" not in s

    def test_tnc2_qconstruct(self):
        """qcall appends the reference's receive-only i-gate q-construct
        ',qAO,CALL' after the digipeater path (aprsfeed.c:222-224)."""
        f = build_ui_frame(src="N0CALL", dst="APRS", digis=("WIDE1-1",),
                           info=b"!x")
        s = frame_to_tnc2(ax25_parse(f), qcall="MYGATE-10")
        assert s == "N0CALL>APRS,WIDE1-1,qAO,MYGATE-10:!x"

    def test_encode_callsign_reserved_bits(self):
        """The SSID byte's reserved bits 5-6 are set on air whether or
        not the has-been-repeated bit is (regression: h=True dropped
        0x60, diverging from every real TNC's framing)."""
        assert encode_callsign("WIDE1-1")[6] == (1 << 1) | 0x60
        assert encode_callsign("WIDE1-1", h=True)[6] == (1 << 1) | 0xE0
        # and the h bit round-trips through the parser
        f = build_ui_frame(digis=("WIDE1-1",))
        hdr = f[:7 * 2] + encode_callsign("WIDE1-1", last=True, h=True)
        p = ax25_parse(append_crc(hdr + bytes([0x03, 0xF0]) + b"x"))
        assert p.digipeaters == [("WIDE1-1", True)]


class TestAFSK:
    def test_closed_loop_decode(self):
        """afsk_modulate -> AFSKDemodulator recovers the exact frame."""
        frame = build_ui_frame(info=b"The quick brown fox 123")
        pcm = afsk_modulate(frame)
        # pad with silence front and back
        pcm = np.concatenate([np.zeros(4000, np.float32), pcm,
                              np.zeros(8000, np.float32)])
        demod = AFSKDemodulator()
        got = demod.process(pcm)
        assert frame in got

    def test_multiple_frames(self):
        f1 = build_ui_frame(src="A1AAA", info=b"frame one")
        f2 = build_ui_frame(src="B2BBB", info=b"frame two")
        pcm = np.concatenate(
            [np.zeros(2000, np.float32), afsk_modulate(f1),
             np.zeros(2000, np.float32), afsk_modulate(f2),
             np.zeros(8000, np.float32)]
        )
        demod = AFSKDemodulator()
        got = demod.process(pcm)
        assert f1 in got and f2 in got

    def test_corrupt_frame_rejected(self):
        frame = build_ui_frame(info=b"good data")
        bad = frame[:-1] + bytes([frame[-1] ^ 0xFF])
        pcm = np.concatenate(
            [afsk_modulate(bad), np.zeros(8000, np.float32)]
        )
        got = AFSKDemodulator().process(pcm)
        assert bad not in got and frame not in got

    def test_timing_offset_tolerated(self):
        """Gardner clock recovery should survive a fractional-bit offset
        (resampled input)."""
        frame = build_ui_frame(info=b"clock recovery test")
        pcm = afsk_modulate(frame)
        # resample by ~0.2% to force steady clock slew
        n = len(pcm)
        x = np.interp(
            np.arange(0, n - 1, 1.002), np.arange(n), pcm
        ).astype(np.float32)
        pcm2 = np.concatenate([np.zeros(4000, np.float32), x,
                               np.zeros(8000, np.float32)])
        got = AFSKDemodulator().process(pcm2)
        assert frame in got

    def test_frame_after_runt_decodes(self):
        """A noise runt between flags must not corrupt the NEXT frame
        (regression: _reset_frame ran after `frame_bit -= 7` and cleared
        only up to the reduced bit count, leaving stale 1-bits that ORed
        into — and CRC-killed — the following valid frame; the reference
        memsets the whole buffer, packet.c:380,397)."""
        frame = build_ui_frame(info=b"survives the runt")
        flag = [0, 1, 1, 1, 1, 1, 1, 0]
        runt = flag * 5 + [1, 0, 1] + hdlc_encode(frame)
        pcm = np.concatenate([np.zeros(4000, np.float32),
                              modulate_bits(runt),
                              np.zeros(8000, np.float32)])
        got = AFSKDemodulator().process(pcm)
        assert frame in got

    def test_frame_after_shared_zero_flags_decodes(self):
        """Back-to-back flags sharing the boundary zero (0111111 0 111111 0,
        legal HDLC) drive frame_bit negative at the flag detect; the old
        partial clear then cleared NOTHING."""
        frame = build_ui_frame(info=b"shared zero flags")
        shared = [0] + [1, 1, 1, 1, 1, 1, 0] * 6      # flags sharing zeros
        bits = shared + hdlc_encode(frame)
        pcm = np.concatenate([np.zeros(4000, np.float32),
                              modulate_bits(bits),
                              np.zeros(8000, np.float32)])
        got = AFSKDemodulator().process(pcm)
        assert frame in got


class TestAPRS:
    def test_timestamp(self):
        rest, d, h, m, s = parse_timestamp("180205h3648.75S/04627.50WO")
        assert (d, h, m, s) == (0, 18, 2, 5)
        assert rest.startswith("3648.75S")
        rest, d, h, m, s = parse_timestamp("092345z...")
        assert (d, h, m) == (9, 23, 45)

    def test_uncompressed_position(self):
        rest, lat, lon, alt = parse_position("3648.75S/04627.50WO000/000/A=039566")
        assert abs(lat - (-(36 + 48.75 / 60))) < 1e-6
        assert abs(lon - (-(46 + 27.50 / 60))) < 1e-6
        assert abs(alt - 39566 * 0.3048) < 0.1

    def test_compressed_position(self):
        # APRS spec example: /YYYYXXXX... lat=49.5 lon=-72.75
        import math
        lat, lon = 49.5, -72.75
        y = int(round(380926 * (90 - lat)))
        x = int(round(190463 * (180 + lon)))
        def enc(v):
            out = ""
            for p in (91**3, 91**2, 91, 1):
                out += chr(v // p + 33)
                v %= p
            return out
        body = "/" + enc(y) + enc(x) + ">  !"
        _, plat, plon, _ = parse_position(body)
        assert abs(plat - lat) < 1e-4
        assert abs(plon - lon) < 1e-4

    def test_parse_aprs_dispatch(self):
        f = build_ui_frame(info=b"!3648.75N/04627.50E-test")
        out = parse_aprs(ax25_parse(f))
        assert out["kind"] == "position"
        assert abs(out["latitude"] - (36 + 48.75 / 60)) < 1e-6

    def test_look_angles(self):
        st = Station(latitude=0.0, longitude=0.0, altitude=0.0)
        # target due east on the equator, ~111 km away
        az, el, rng = look_angles(st, 0.0, 1.0, 0.0)
        assert abs(az - 90.0) < 1.0
        assert el < 0  # over the horizon curve
        assert 100e3 < rng < 120e3

    def test_look_angles_coincident_target(self):
        """A beacon at the station's own coordinates yields nan angles
        like the C's 0.0/0.0 (aprs.c:257-261), not ZeroDivisionError
        (which killed the aprs daemon's receive loop)."""
        st = Station(latitude=32.0, longitude=-117.0, altitude=100.0)
        az, el, rng = look_angles(st, 32.0, -117.0, 100.0)
        assert math.isnan(az) and math.isnan(el) and rng == 0.0

    def test_position_symbol_char_not_scanned_for_altitude(self):
        """The char after W/E is the symbol-table entry and is skipped
        before the A= scan (aprs.c:339 'data = ncp + 2'): a symbol 'A'
        followed by a comment starting '=' is NOT an altitude."""
        rest, lat, lon, alt = parse_position("4903.50N/07201.75WA=023456x")
        assert math.isnan(alt)
        assert rest == "=023456x"
        # a real A= past the symbol char still parses
        _, _, _, alt2 = parse_position("4903.50N/07201.75W>cmt A=001000")
        assert abs(alt2 - 1000 * 0.3048) < 0.1

    def test_passcode(self):
        from ka9q_sdr_tpu.apps.aprsfeed import aprs_passcode
        # well-known APRS-IS hash examples
        assert aprs_passcode("KA9Q") == aprs_passcode("ka9q-15")
        assert 0 <= aprs_passcode("N0CALL") <= 0x7FFF


class TestPacketdDaemonLoop:
    def test_pcm_ingest_loop(self, tmp_path):
        """packetd's own socket loop ingests PCM datagrams (regression:
        a refactor called rtp_payload without importing it, so the FIRST
        PCM packet crashed the daemon with NameError — the DSP-level
        chain tests bypass main()).  Hostile odd-length payloads must be
        tolerated too."""
        import threading

        from ka9q_sdr_tpu.apps import packetd
        from ka9q_sdr_tpu.net.multicast import setup_mcast
        from ka9q_sdr_tpu.net.rtp import RTPHeader, PCM_MONO_PT

        GRP, OUT = "239.88.11.7:5204", "239.88.11.8:5204"
        res = {}
        th = threading.Thread(
            target=lambda: res.update(
                rc=packetd.main(["-I", GRP, "-R", OUT, "--packets", "3"])),
            daemon=True)
        th.start()
        import time

        time.sleep(0.3)
        tx = setup_mcast(GRP, output=True, ttl=0)
        pay = np.zeros(240, ">i2").tobytes()
        deadline = time.time() + 15.0
        seq = 0
        while th.is_alive() and time.time() < deadline:
            tx.send(RTPHeader(type=PCM_MONO_PT, seq=seq, timestamp=seq * 240,
                              ssrc=5).to_bytes() + pay)
            # hostile ragged payload interleaved — must not kill the loop
            tx.send(RTPHeader(type=PCM_MONO_PT, seq=seq + 1,
                              timestamp=(seq + 1) * 240,
                              ssrc=5).to_bytes() + b"\x01")
            seq += 2
            time.sleep(0.02)
        th.join(timeout=5.0)
        assert res.get("rc") == 0


class TestFMPacketChain:
    def test_aprs_over_nbfm_channel(self):
        """The reference's APRS chain: AFSK-1200 audio frequency-modulated
        onto an NBFM carrier, demodulated by the FM receiver (including
        de-emphasis), then decoded by the packet modem — radio -> packetd
        end to end in the DSP domain."""
        from ka9q_sdr_tpu.models.receiver import Receiver, make_receiver_config
        from ka9q_sdr_tpu.decode.afsk import AFSKDemodulator, afsk_modulate

        frame = build_ui_frame(src="KA9Q-9", info=b"!3722.50N/12200.00W-fm chain")
        audio48 = afsk_modulate(frame, amplitude=1.0)
        audio48 = np.concatenate(
            [np.zeros(4000, np.float32), audio48, np.zeros(8000, np.float32)]
        )
        FS, Lb = 192000, 3840
        # FM-modulate at 3 kHz deviation: zero-order-hold to 192 kHz
        audio192 = np.repeat(audio48, 4)
        n = (len(audio192) // Lb) * Lb
        audio192 = audio192[:n]
        inst = 3000.0 * audio192
        ph = np.cumsum(2 * np.pi * inst / FS)
        iq = (0.5 * np.exp(1j * (2 * np.pi * 20000 * np.arange(n) / FS + ph))
              ).astype(np.complex64)

        rx = Receiver(make_receiver_config("FM", samprate=FS, enable_pl=False))
        rx.set_freq(20000.0)
        demod = AFSKDemodulator()
        got = []
        for b in range(n // Lb):
            audio, _ = rx.process(iq[b * Lb : (b + 1) * Lb])
            got += demod.process(np.asarray(audio))
        assert frame in got, [len(g) for g in got]

    def test_aprs_over_nbfm_through_the_channel_bank(self):
        """The same chain at BANK scale: the AFSK/NBFM signal is one of
        several carriers into an 8-channel FM ChannelBank; its channel's
        audio row decodes the APRS frame while a neighbor channel
        simultaneously demodulates its own tone — the bank is a drop-in
        for per-channel `radio` in the reference's packet pipeline."""
        from ka9q_sdr_tpu.models.bank import make_bank_config, ChannelBank
        from ka9q_sdr_tpu.decode.afsk import AFSKDemodulator, afsk_modulate

        frame = build_ui_frame(src="KA9Q-9", info=b"!3722.50N/12200.00W-bank")
        audio48 = afsk_modulate(frame, amplitude=1.0)
        audio48 = np.concatenate(
            [np.zeros(4000, np.float32), audio48, np.zeros(8000, np.float32)]
        )
        FS, Lb = 1536000, 30720          # decim 32, L_dec = 960
        n_ch = 8
        usable = 0.9 * FS
        freqs = list(np.linspace(-usable / 2, usable / 2, n_ch,
                                 endpoint=False))
        aprs_ch, tone_ch = 3, 5

        audio_hi = np.repeat(audio48, 32)
        n = (len(audio_hi) // Lb) * Lb
        audio_hi = audio_hi[:n]
        tt = np.arange(n) / FS
        inst = 3000.0 * audio_hi
        ph = np.cumsum(2 * np.pi * inst / FS)
        iq = 0.5 * np.exp(1j * (2 * np.pi * freqs[aprs_ch] * tt + ph))
        # neighbor: NBFM voice-ish tone at 1 kHz, 3 kHz deviation
        ph2 = np.cumsum(2 * np.pi * 3000.0 *
                        np.sin(2 * np.pi * 1000.0 * tt) / FS)
        iq = (iq + 0.5 * np.exp(1j * (2 * np.pi * freqs[tone_ch] * tt + ph2))
              ).astype(np.complex64)

        cfg = make_bank_config(n_ch, "FM", samprate=FS, L=Lb,
                               M=2048 * 32 - Lb + 1)
        bank = ChannelBank(cfg, freqs)
        demod = AFSKDemodulator()
        got = []
        tone = []
        for b in range(n // Lb):
            audio, _ = bank.process(iq[b * Lb:(b + 1) * Lb])
            a = np.asarray(audio)
            got += demod.process(a[aprs_ch])
            tone.append(a[tone_ch])
        assert frame in got, [len(g) for g in got]
        x = np.concatenate(tone)[2000:].astype(np.float64)
        X = np.abs(np.fft.rfft(x)) ** 2
        k = int(round(1000.0 * len(x) / 48000))
        assert X[k - 2:k + 3].sum() / X.sum() > 0.5   # neighbor unharmed
