"""Wire-protocol tests: RTP, TLV status, RTCP, PCM framing, recordings.

Formats must round-trip and match the reference's byte layouts
(multicast.c, status.c, rtcp.c, audio.c, sdr.h).
"""

import os
import socket

import numpy as np
import pytest

from ka9q_sdr_tpu.net import (
    RTPHeader,
    RTPState,
    rtp_process,
    StatusType,
    encode_int,
    encode_float,
    encode_double,
    encode_eol,
    decode_int,
    decode_float,
    decode_double,
    decode_packet,
    StatusCompactor,
    RTCPSenderReport,
    RTCPReceiverReport,
    SDESItem,
    gen_sr,
    gen_sdes,
    gen_bye,
    LegacyStatus,
    PCM_MONO_PT,
    IQ_PT,
)
from ka9q_sdr_tpu.io import PCMOutput, pcm_to_float, IQRecorder, IQReader
from ka9q_sdr_tpu.io.iqfile import write_metadata, read_metadata


class TestRTP:
    def test_header_roundtrip(self):
        h = RTPHeader(type=97, seq=0x1234, timestamp=0xDEADBEEF,
                      ssrc=0xCAFEBABE, marker=True)
        wire = h.to_bytes()
        assert len(wire) == 12
        # spot-check wire layout (multicast.c:282-294)
        assert wire[0] == 0x80            # v2, no pad/ext/cc
        assert wire[1] == 0x80 | 97       # marker | type
        assert wire[2:4] == b"\x12\x34"
        h2, off = RTPHeader.from_bytes(wire)
        assert off == 12
        assert (h2.type, h2.seq, h2.timestamp, h2.ssrc, h2.marker) == (
            97, 0x1234, 0xDEADBEEF, 0xCAFEBABE, True)

    def test_rtp_process_gaps_and_dupes(self):
        st = RTPState()
        h = RTPHeader(type=97, seq=10, timestamp=1000, ssrc=1)
        assert rtp_process(st, h, 240) == 0          # first packet inits
        h = RTPHeader(type=97, seq=11, timestamp=1240, ssrc=1)
        assert rtp_process(st, h, 240) == 0
        # drop 2 packets: timestamp jumps 3*240
        h = RTPHeader(type=97, seq=14, timestamp=1240 + 3 * 240, ssrc=1)
        assert rtp_process(st, h, 240) == 480
        assert st.drops == 2
        # duplicate
        h = RTPHeader(type=97, seq=14, timestamp=1240 + 3 * 240, ssrc=1)
        assert rtp_process(st, h, 240) < 0
        assert st.dupes == 1

    def test_rtp_process_seq_wrap(self):
        st = RTPState()
        h = RTPHeader(type=97, seq=0xFFFF, timestamp=0xFFFFFF00, ssrc=7)
        rtp_process(st, h, 256)
        h = RTPHeader(type=97, seq=0, timestamp=0, ssrc=7)  # both wrap
        assert rtp_process(st, h, 240) == 0

    def test_ssrc_change_resets(self):
        st = RTPState()
        rtp_process(st, RTPHeader(type=97, seq=5, timestamp=100, ssrc=1), 10)
        assert rtp_process(
            st, RTPHeader(type=97, seq=900, timestamp=5, ssrc=2), 10
        ) == 0  # new stream accepted cleanly (multicast.c:306-313)


class TestTLV:
    def test_int_leading_zero_suppression(self):
        buf = bytearray()
        encode_int(buf, StatusType.OUTPUT_SAMPRATE, 48000)
        # 48000 = 0xBB80 -> 2 bytes
        assert bytes(buf) == bytes([StatusType.OUTPUT_SAMPRATE, 2, 0xBB, 0x80])
        assert decode_int(bytes(buf[2:])) == 48000

    def test_zero_encodes_empty(self):
        buf = bytearray()
        encode_int(buf, 5, 0)
        assert bytes(buf) == bytes([5, 0])
        assert decode_int(b"") == 0

    def test_float_double_roundtrip(self):
        buf = bytearray()
        encode_float(buf, StatusType.DEMOD_SNR, 12.5)
        encode_double(buf, StatusType.RADIO_FREQUENCY, 147_435_000.123)
        encode_eol(buf)
        items = dict(decode_packet(bytes(buf)))
        assert decode_float(items[StatusType.DEMOD_SNR]) == 12.5
        assert decode_double(items[StatusType.RADIO_FREQUENCY]) == 147_435_000.123

    def test_float_double_cross_decode(self):
        """decode_float of an 8-byte value reads a double and vice versa
        (status.c:134-148)."""
        buf = bytearray()
        encode_double(buf, 1, 3.5)
        items = dict(decode_packet(bytes(buf) + b"\x00"))
        assert decode_float(items[1]) == 3.5

    def test_compactor_delta(self):
        c = StatusCompactor()
        pkt = bytearray([0])   # status response byte
        encode_int(pkt, StatusType.OUTPUT_SAMPRATE, 48000)
        encode_float(pkt, StatusType.IF_POWER, -20.0)
        encode_eol(pkt)
        full = c.compact(bytes(pkt))
        assert len(full) == len(pkt)
        # unchanged resend -> only cmd byte + EOL
        again = c.compact(bytes(pkt))
        assert again == bytes([0, StatusType.EOL])
        # change one key -> only that key
        pkt2 = bytearray([0])
        encode_int(pkt2, StatusType.OUTPUT_SAMPRATE, 48000)
        encode_float(pkt2, StatusType.IF_POWER, -21.0)
        encode_eol(pkt2)
        delta = c.compact(bytes(pkt2))
        items = dict(decode_packet(delta[1:]))
        assert list(items) == [StatusType.IF_POWER]
        # force -> everything
        forced = c.compact(bytes(pkt2), force=True)
        assert len(forced) == len(pkt2)


class TestRTCP:
    def test_sr_layout(self):
        sr = RTCPSenderReport(ssrc=1, ntp_timestamp=(2 << 32) | 3,
                              rtp_timestamp=4, packet_count=5, byte_count=6)
        wire = gen_sr(sr)
        assert wire[0] == 0x80 and wire[1] == 200
        assert int.from_bytes(wire[2:4], "big") == 6  # words-1
        assert len(wire) == 28

    def test_sdes_padding(self):
        wire = gen_sdes(0x1234, [SDESItem(1, b"radio@host")])
        assert len(wire) % 4 == 0
        assert wire[1] == 202

    def test_bye(self):
        wire = gen_bye([1, 2])
        assert wire[1] == 203 and len(wire) == 12

    def test_report_count_bounded(self):
        """RC is a 5-bit field: 32 reports would overflow into the
        padding bit (first byte 0xA0) and corrupt the header."""
        import pytest

        from ka9q_sdr_tpu.net.rtcp import RTCPReceiverReport, gen_rr

        rr = RTCPReceiverReport(ssrc=1)
        with pytest.raises(ValueError):
            gen_sr(RTCPSenderReport(ssrc=1), [rr] * 32)
        with pytest.raises(ValueError):
            gen_rr(1, [rr] * 32)
        assert gen_rr(1, [rr] * 31)[0] == 0x80 | 31


class TestLegacyStatus:
    def test_roundtrip(self):
        s = LegacyStatus(timestamp=123456789, frequency=146.52e6,
                         samprate=192000, lna_gain=1, mixer_gain=2, if_gain=30)
        data = s.to_bytes()
        assert len(data) == 24
        s2 = LegacyStatus.from_bytes(data)
        assert s2 == s

    def test_short_payload_raises_valueerror(self):
        """Wire ingest loops guard parsers with `except ValueError`;
        struct.error from a truncated hostile payload escaped that."""
        import pytest

        with pytest.raises(ValueError):
            LegacyStatus.from_bytes(b"short")


class TestPCMOutput:
    def test_mono_framing_and_silence(self):
        sent = []
        out = PCMOutput(send=sent.append, ssrc=42)
        audio = np.zeros(960, np.float32)
        audio[100:200] = 0.5
        out.send_mono(audio)   # two 480-sample packets; 2nd is silent
        assert len(sent) == 1
        h, off = RTPHeader.from_bytes(sent[0])
        assert h.type == PCM_MONO_PT and h.ssrc == 42
        assert not h.marker  # silent flag starts clear (audio.c: output.silent=0)
        out.send_mono(audio)
        h2, _ = RTPHeader.from_bytes(sent[1])
        assert h2.timestamp == 960  # suppressed packet advanced the clock
        assert h2.marker  # follows a silent packet -> talk-spurt marker

    def test_payload_roundtrip(self):
        sent = []
        out = PCMOutput(send=sent.append, ssrc=1)
        audio = np.linspace(-0.5, 0.5, 480).astype(np.float32)
        out.send_mono(audio)
        _, off = RTPHeader.from_bytes(sent[0])
        back = pcm_to_float(sent[0][off:])
        assert np.allclose(back, audio, atol=1 / 32000)

    def test_clipping(self):
        sent = []
        out = PCMOutput(send=sent.append, ssrc=1)
        out.send_mono(np.array([2.0, -2.0, 0.5], np.float32))
        _, off = RTPHeader.from_bytes(sent[0])
        v = np.frombuffer(sent[0][off:], ">i2")
        assert v[0] == 32767 and v[1] == -32768


class TestIQFile:
    def test_metadata_roundtrip(self, tmp_path):
        p = str(tmp_path / "rec")
        open(p, "wb").close()
        write_metadata(p, {"samplerate": "192000", "frequency": "146520000.000"})
        attrs = read_metadata(p)
        assert attrs["samplerate"] == "192000"

    def test_record_replay_with_gap(self, tmp_path):
        rec = IQRecorder(directory=str(tmp_path), frequency=1e6,
                         samprate=192000)
        iq = (np.arange(240) % 7 - 3).astype(np.int16)
        payload = np.empty(480, np.int16)
        payload[0::2] = iq
        payload[1::2] = -iq
        data = payload.astype("<i2").tobytes()
        rec.write_packet(RTPHeader(type=IQ_PT, seq=0, timestamp=0, ssrc=9), data)
        # drop one packet: 240-sample hole
        rec.write_packet(RTPHeader(type=IQ_PT, seq=2, timestamp=480, ssrc=9), data)
        rec.close()
        rd = IQReader(rec.path)
        assert rd.samprate == 192000
        blocks = list(rd.blocks(240))
        assert len(blocks) == 3
        assert np.all(blocks[1] == 0)              # the hole reads as zeros
        assert np.allclose(blocks[0], blocks[2])   # same payload either side


class TestModulator:
    def test_am_generates_carrier_plus_sidebands(self):
        from ka9q_sdr_tpu.io import Modulator

        m = Modulator("am", frequency=48000.0, amplitude_db=-6.0)
        rng = np.random.default_rng(0)
        blocks = []
        for _ in range(10):
            audio = 0.5 * np.sin(
                2 * np.pi * 1000 * np.arange(len(blocks) * 240, len(blocks) * 240 + 240) / 48000
            ).astype(np.float32)
            blocks.append(m.process(audio))
        x = np.concatenate(blocks)[960:]
        spec = np.abs(np.fft.fft(x * np.hanning(len(x))))
        f = np.fft.fftfreq(len(x), 1 / 192000)
        # carrier at 48 kHz
        carrier_bin = np.argmin(np.abs(f - 48000))
        sb_bin = np.argmin(np.abs(f - 49000))
        noise_bin = np.argmin(np.abs(f - 70000))
        assert spec[carrier_bin] > 10 * spec[noise_bin]
        assert spec[sb_bin] > 3 * spec[noise_bin]

    def test_usb_suppresses_lower_sideband(self):
        from ka9q_sdr_tpu.io import Modulator

        m = Modulator("usb", frequency=48000.0, amplitude_db=-6.0)
        blocks = []
        for b in range(10):
            tt = (b * 240 + np.arange(240)) / 48000
            blocks.append(m.process(0.5 * np.sin(2 * np.pi * 1000 * tt).astype(np.float32)))
        x = np.concatenate(blocks)[960:]
        spec = np.abs(np.fft.fft(x * np.hanning(len(x))))
        f = np.fft.fftfreq(len(x), 1 / 192000)
        usb = spec[np.argmin(np.abs(f - 49000))]
        lsb = spec[np.argmin(np.abs(f - 47000))]
        assert usb > 30 * lsb


class TestBlockAssembler:
    def _packet(self, seq, ts, payload_samples, ssrc=3, pt=97, legacy=True):
        from ka9q_sdr_tpu.net.rtp import RTPHeader
        from ka9q_sdr_tpu.net.sdr_header import LegacyStatus

        hdr = RTPHeader(type=pt, seq=seq, timestamp=ts, ssrc=ssrc)
        body = hdr.to_bytes()
        if legacy:
            body += LegacyStatus(samprate=192000).to_bytes()
        return body + payload_samples

    def test_gap_fill_and_scaling(self):
        from ka9q_sdr_tpu.io.assembler import BlockAssembler

        asm = BlockAssembler(720)
        pay = np.full(480, 16384, np.int16).astype("<i2").tobytes()  # 240 samp
        asm.push(self._packet(0, 0, pay))
        asm.push(self._packet(2, 480, pay))  # packet 1 lost -> 240-sample hole
        blocks = list(asm.blocks())
        assert len(blocks) == 1
        b = blocks[0]
        assert np.allclose(b[:240].real, 16384 / 32767)
        assert np.all(b[240:480] == 0)        # the hole
        assert np.allclose(b[480:].real, 16384 / 32767)
        assert asm.rtp_state.drops == 1

    def test_iq8_payload(self):
        from ka9q_sdr_tpu.io.assembler import BlockAssembler

        asm = BlockAssembler(240)
        pay = np.full(480, 64, np.int8).tobytes()   # 240 samples of 64/127
        asm.push(self._packet(0, 0, pay, pt=98))
        (b,) = list(asm.blocks())
        assert np.allclose(b.real, 64 / 127, atol=1e-6)

    def test_dupes_dropped(self):
        from ka9q_sdr_tpu.io.assembler import BlockAssembler

        asm = BlockAssembler(240)
        pay = np.zeros(480, "<i2").tobytes()
        asm.push(self._packet(5, 0, pay))
        asm.push(self._packet(5, 0, pay))
        assert asm.rtp_state.dupes == 1
        assert len(list(asm.blocks())) == 1


class TestTLVRobustness:
    """A network daemon must survive ANY datagram (the reference's decode
    loop is pointer-bounds-checked, status.c:112-122; ours must match).
    Found by fuzzing: truncated type-without-length packets used to raise
    IndexError, and oversized int values used to overflow struct.pack."""

    def test_truncated_packets_terminate_cleanly(self):
        from ka9q_sdr_tpu.net import status as st

        pkt = bytearray()
        st.encode_int(pkt, st.StatusType.OUTPUT_SSRC, 5)
        st.encode_double(pkt, st.StatusType.RADIO_FREQUENCY, 1.0e6)
        st.encode_string(pkt, st.StatusType.RADIO_MODE, "USB")
        st.encode_eol(pkt)
        for cut in range(len(pkt)):
            list(st.decode_packet(bytes(pkt[:cut])))   # must not raise

    def test_random_garbage_decodes(self):
        import random

        from ka9q_sdr_tpu.net import status as st

        rng = random.Random(42)
        for _ in range(500):
            n = rng.randrange(0, 64)
            data = bytes(rng.randrange(256) for _ in range(n))
            for t, v in st.decode_packet(data):
                # every decoder must accept any value bytes
                st.decode_int(v)
                st.decode_float(v)
                st.decode_double(v)

    def test_oversized_values(self):
        from ka9q_sdr_tpu.net import status as st

        v = bytes(range(1, 17))       # 16-byte value
        assert st.decode_int(v) == int.from_bytes(v, "big") & (2**64 - 1)
        st.decode_float(v)            # low 32 bits, no raise
        st.decode_double(v)           # low 64 bits, no raise

    def test_daemon_command_handlers_survive_fuzz(self, tmp_path):
        """parse_command + the bank daemons' handle_command on garbage:
        no exception, no state change from foreign/broken packets."""
        import random

        from ka9q_sdr_tpu.apps.bankd import parse_command
        from ka9q_sdr_tpu.net.status import StatusType
        from ka9q_sdr_tpu.net import status as st

        rng = random.Random(7)
        for _ in range(500):
            n = rng.randrange(0, 48)
            data = bytes([1]) + bytes(rng.randrange(256) for _ in range(n))
            parse_command(data)       # must not raise
        # a valid header with a truncated double value
        pkt = bytearray([1])
        st.encode_int(pkt, StatusType.OUTPUT_SSRC, 3)
        pkt += bytes([int(StatusType.RADIO_FREQUENCY), 8, 0x41])  # len 8, 1 byte
        parse_command(bytes(pkt))     # must not raise

    def test_compactor_survives_fuzz(self):
        import random

        from ka9q_sdr_tpu.net.status import StatusCompactor

        rng = random.Random(9)
        c = StatusCompactor()
        for _ in range(200):
            n = rng.randrange(0, 48)
            c.compact(bytes([0]) + bytes(rng.randrange(256) for _ in range(n)))

    def test_assembler_survives_garbage_datagrams(self):
        """The daemons' network loops feed recv() straight into
        BlockAssembler.push: malformed RTP must be counted and dropped,
        never raised (one bad datagram used to kill the daemon)."""
        import random

        from ka9q_sdr_tpu.io.assembler import BlockAssembler
        from ka9q_sdr_tpu.net.rtp import RTPHeader, IQ_PT

        asm = BlockAssembler(960)
        rng = random.Random(3)
        for _ in range(300):
            n = rng.randrange(0, 40)
            asm.push(bytes(rng.randrange(256) for _ in range(n)))
        # truncated CSRC list (cc=15, no CSRC words)
        asm.push(bytes([0x8F, IQ_PT, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1]))
        # extension flag set, no extension header
        asm.push(bytes([0x90, IQ_PT, 0, 2, 0, 0, 0, 0, 0, 0, 0, 1]))
        assert asm.malformed > 0
        # a good packet still lands after all the garbage
        pay = np.full(480, 1000, np.int16).astype("<i2").tobytes()
        asm.push(RTPHeader(type=IQ_PT, seq=0, timestamp=0, ssrc=1)
                 .to_bytes() + b"\x00" * 24 + pay)
        asm.push(RTPHeader(type=IQ_PT, seq=1, timestamp=240, ssrc=1)
                 .to_bytes() + b"\x00" * 24 + pay)
        asm.push(RTPHeader(type=IQ_PT, seq=2, timestamp=480, ssrc=1)
                 .to_bytes() + b"\x00" * 24 + pay)
        asm.push(RTPHeader(type=IQ_PT, seq=3, timestamp=720, ssrc=1)
                 .to_bytes() + b"\x00" * 24 + pay)
        blocks = list(asm.blocks())
        assert len(blocks) == 1 and np.all(np.asarray(blocks[0]) != 0)
