"""Differential fuzz: Python codecs vs the COMPILED reference C.

The reference C (status.c, multicast.c, rtcp.c, ax25.c, modes.c,
bandplan.c) is the byte-format ground truth.  tests/c_ref.py compiles the
FFTW-free TUs into a shared object at session start; every test here runs
the same inputs through the C and the Python and requires byte-for-byte
(or field-for-field) equality.  Divergences are either fixed in the
Python or documented in PARITY.md — never silently tolerated.

Skipped as a unit when gcc or /root/reference is unavailable.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from ka9q_sdr_tpu.net import rtcp as py_rtcp
from ka9q_sdr_tpu.net import rtp as py_rtp
from ka9q_sdr_tpu.net import status as py_status
from ka9q_sdr_tpu.decode import ax25 as py_ax25
from ka9q_sdr_tpu.utils import bandplan as py_bandplan
from ka9q_sdr_tpu.utils import modes as py_modes

import c_ref

cref = c_ref.get_cref()
pytestmark = pytest.mark.skipif(
    cref is None, reason="gcc or /root/reference unavailable"
)

DATA_DIR = "/root/repo/ka9q_sdr_tpu/data"


def _rng():
    return np.random.default_rng(0xC0FFEE)


# ===================================================================== TLV

INT_CORPUS = [
    0, 1, 0xFF, 0x100, 0xFFFF, 0x10000, 0xFFFFFFFF, 0x100000000,
    0xFFFFFFFFFFFFFFFF, 0x8000000000000000, 0x00FF00FF00FF00FF,
    1 << 55, (1 << 56) - 1, 1 << 56,
]


class TestTLVEncode:
    def test_int64_corpus_and_fuzz(self):
        rng = _rng()
        vals = INT_CORPUS + [
            int(rng.integers(0, 1 << int(b), dtype=np.uint64))
            for b in rng.integers(1, 64, size=200)
        ]
        for x in vals:
            for t in (1, 16, 50, 255):
                buf = bytearray()
                py_status.encode_int(buf, t, x)
                assert bytes(buf) == cref.encode_int64(t, x), hex(x)

    def test_negative_int_sign_extension(self):
        # encode_int (status.c:80-82) casts through C int: negative values
        # sign-extend to 64 bits, so no leading-zero suppression happens
        for x in (-1, -5, -32768, -2147483648, -1000000):
            buf = bytearray()
            py_status.encode_int(buf, 2, x)
            assert bytes(buf) == cref.encode_int(2, x), x

    def test_float_corpus(self):
        rng = _rng()
        specials = [
            0.0, -0.0, 1.5, -1.5, float("inf"), float("-inf"),
            float("nan"), 1e-45, -1e-45, 3.4e38, 1.17549435e-38,
        ]
        vals = specials + [float(v) for v in rng.normal(0, 1e6, 200)]
        for x in vals:
            buf = bytearray()
            py_status.encode_float(buf, 36, np.float32(x))
            assert bytes(buf) == cref.encode_float(36, x), x

    def test_double_corpus(self):
        rng = _rng()
        specials = [0.0, -0.0, 1.5e300, -2.2250738585072014e-308,
                    float("inf"), float("nan"), 147.435e6]
        vals = specials + [float(v) for v in rng.normal(0, 1e9, 200)]
        for x in vals:
            buf = bytearray()
            py_status.encode_double(buf, 16, x)
            assert bytes(buf) == cref.encode_double(16, x), x

    def test_string_lengths(self):
        rng = _rng()
        for n in (0, 1, 100, 254, 255, 256, 300):
            s = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
            buf = bytearray()
            py_status.encode_string(buf, 39, s)
            assert bytes(buf) == cref.encode_string(39, s), n


class TestTLVDecode:
    def test_int_all_lengths(self):
        rng = _rng()
        for n in range(0, 11):
            for _ in range(30):
                v = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
                assert py_status.decode_int(v) == cref.decode_int(v), v.hex()

    def test_float_all_lengths(self):
        rng = _rng()
        for n in range(0, 9):
            for _ in range(50):
                v = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
                got = py_status.decode_float(v)
                want = cref.decode_float(v)
                if math.isnan(want):
                    assert math.isnan(got), v.hex()
                else:
                    # C float->double widening; compare the f32 bits
                    assert struct.pack(">f", got) == struct.pack(
                        ">f", want
                    ), v.hex()

    def test_double_all_lengths(self):
        rng = _rng()
        for n in range(0, 9):
            for _ in range(50):
                v = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
                got = py_status.decode_double(v)
                want = cref.decode_double(v)
                if math.isnan(want):
                    assert math.isnan(got), v.hex()
                else:
                    assert got == want, v.hex()


def _random_tlv_packet(rng, keys) -> bytes:
    """A well-formed TLV packet: cmd byte, items, EOL."""
    buf = bytearray([0])
    for t in keys:
        n = int(rng.integers(0, 12))
        buf.append(t)
        buf.append(n)
        buf += bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
    buf.append(0)
    return bytes(buf)


class TestCompactPacket:
    def test_delta_stream(self):
        """A stream of packets with overlapping keys through both
        compactors; every 10th forced (radio_status.c:207-208)."""
        rng = _rng()
        cstate = cref.new_compact_state()
        pystate = py_status.StatusCompactor()
        for i in range(100):
            nkeys = int(rng.integers(1, 12))
            keys = rng.choice(np.arange(1, 51), size=nkeys, replace=False)
            pkt = _random_tlv_packet(rng, [int(k) for k in keys])
            force = i % 10 == 0
            got = pystate.compact(pkt, force=force)
            want = cref.compact_packet(cstate, pkt, force)
            assert got == want, f"packet {i}"

    def test_repeated_key_in_one_packet(self):
        pkt = bytes([0, 5, 2, 0xAA, 0xBB, 5, 2, 0xAA, 0xBB,
                     5, 1, 0xCC, 0])
        cstate = cref.new_compact_state()
        pystate = py_status.StatusCompactor()
        assert pystate.compact(pkt) == cref.compact_packet(cstate, pkt, False)

    def test_zero_length_values(self):
        pkt = bytes([0, 7, 0, 8, 0, 0])
        cstate = cref.new_compact_state()
        pystate = py_status.StatusCompactor()
        for force in (False, False, True):
            assert pystate.compact(pkt, force) == cref.compact_packet(
                cstate, pkt, force
            )


# ===================================================================== RTP

class TestRTPMarshal:
    def test_hton_fuzz(self):
        # pad/extension stay 0 here: the C's signed int:1 bitfields
        # sign-extend when set and corrupt the version bits — see
        # test_hton_pad_extension_c_quirk and PARITY.md
        rng = _rng()
        for _ in range(300):
            cc = int(rng.integers(0, 16))
            kw = dict(
                pad=0,
                extension=0,
                marker=int(rng.integers(0, 2)),
                type=int(rng.integers(0, 128)),
                seq=int(rng.integers(0, 1 << 16)),
                timestamp=int(rng.integers(0, 1 << 32)),
                ssrc=int(rng.integers(0, 1 << 32)),
                csrc=tuple(
                    int(v) for v in rng.integers(0, 1 << 32, size=cc)
                ),
            )
            want = cref.hton_rtp(cc=cc, **kw)
            h = py_rtp.RTPHeader(
                version=2, type=kw["type"], seq=kw["seq"],
                timestamp=kw["timestamp"], ssrc=kw["ssrc"],
                marker=bool(kw["marker"]), pad=bool(kw["pad"]),
                extension=bool(kw["extension"]), csrc=kw["csrc"],
            )
            assert h.to_bytes() == want

    def test_hton_pad_extension_c_quirk(self):
        """hton_rtp's pad/extension are signed int:1 bitfields
        (multicast.h:33-35): storing 1 reads back as -1, and
        `rtp->pad << 5` then sets every bit above bit 5, corrupting the
        version field to 3 (multicast.c:286).  The reference never sets
        pad or extension on transmit (audio.c, funcube.c), so the quirk
        is unreachable in practice; the rebuild emits the correct bits
        and documents the divergence in PARITY.md.  This test pins the
        C behavior so the divergence stays knowingly-accepted."""
        want = cref.hton_rtp(pad=1, type=97, seq=1, timestamp=2, ssrc=3)
        assert want[0] >> 6 == 3  # C emits version "3" when pad is set
        got = py_rtp.RTPHeader(
            type=97, seq=1, timestamp=2, ssrc=3, pad=True
        ).to_bytes()
        assert got[0] >> 6 == 2   # rebuild keeps version 2
        assert got[0] & 0x3F == want[0] & 0x3F  # low bits agree
        assert got[1:] == want[1:]

    def test_ntoh_fuzz_roundtrip(self):
        rng = _rng()
        for _ in range(300):
            cc = int(rng.integers(0, 16))
            ext = int(rng.integers(0, 2))
            wire = bytearray(cref.hton_rtp(
                cc=cc, extension=ext,
                pad=int(rng.integers(0, 2)),
                marker=int(rng.integers(0, 2)),
                type=int(rng.integers(0, 128)),
                seq=int(rng.integers(0, 1 << 16)),
                timestamp=int(rng.integers(0, 1 << 32)),
                ssrc=int(rng.integers(0, 1 << 32)),
                csrc=tuple(
                    int(v) for v in rng.integers(0, 1 << 32, size=cc)
                ),
            ))
            if ext:
                # append a well-formed extension: type(2) len(2) body
                ext_words = int(rng.integers(0, 4))
                wire += struct.pack(">HH", 0x1234, ext_words)
                wire += bytes(4 + ext_words)  # 4 + len per multicast.c:272
            wire += bytes(rng.integers(0, 256, size=32, dtype=np.uint8))
            want_hdr, want_off = cref.ntoh_rtp(bytes(wire))
            got, got_off = py_rtp.RTPHeader.from_bytes(bytes(wire))
            assert got_off == want_off
            assert got.version == want_hdr["version"]
            assert int(got.pad) == want_hdr["pad"]
            assert int(got.extension) == want_hdr["extension"]
            assert int(got.marker) == want_hdr["marker"]
            assert got.type == want_hdr["type"]
            assert got.seq == want_hdr["seq"]
            assert got.timestamp == want_hdr["timestamp"]
            assert got.ssrc == want_hdr["ssrc"]
            assert got.csrc == want_hdr["csrc"]


class TestRTPProcess:
    @staticmethod
    def _pystate_to_list(s: py_rtp.RTPState) -> list[int]:
        return [s.ssrc, int(s.init), s.seq, s.timestamp, s.packets,
                s.bytes, s.drops, s.dupes]

    def test_walk_fuzz(self):
        """Random walk of seq/ts steps incl. wraparounds, dupes, SSRC
        changes; verdict and full state compared after every packet."""
        rng = _rng()
        cstate = [0] * 8
        pystate = py_rtp.RTPState()
        seq, ts = 0xFFF0, 0xFFFFFF00  # start near both wrap points
        ssrc = 42
        for i in range(500):
            r = rng.random()
            if r < 0.05:
                ssrc = int(rng.integers(0, 1 << 32))    # producer restart
            elif r < 0.15:
                seq = (seq - int(rng.integers(1, 4))) & 0xFFFF  # dupe/old
                ts = (ts - int(rng.integers(0, 2000))) & 0xFFFFFFFF
            elif r < 0.30:
                seq = (seq + int(rng.integers(2, 12))) & 0xFFFF  # drops
                ts = (ts + int(rng.integers(240, 5000))) & 0xFFFFFFFF
            else:
                seq = (seq + 1) & 0xFFFF
                ts = (ts + 240) & 0xFFFFFFFF
            sampcnt = int(rng.choice([240, 480, 960]))
            want = cref.rtp_process(cstate, ssrc, seq, ts, sampcnt)
            hdr = py_rtp.RTPHeader(ssrc=ssrc, seq=seq, timestamp=ts)
            got = py_rtp.rtp_process(pystate, hdr, sampcnt)
            assert got == want, f"verdict differs at packet {i}"
            assert self._pystate_to_list(pystate) == cstate, f"packet {i}"


# ==================================================================== RTCP

class TestRTCP:
    def test_sr_fuzz(self):
        rng = _rng()
        for _ in range(100):
            rc = int(rng.integers(0, 5))
            sr = (
                int(rng.integers(0, 1 << 32)),
                int(rng.integers(0, 1 << 62)),
                int(rng.integers(0, 1 << 32)),
                int(rng.integers(0, 1 << 31)),
                int(rng.integers(0, 1 << 31)),
            )
            rrs = [
                (
                    int(rng.integers(0, 1 << 32)),
                    int(rng.integers(0, 256)),
                    int(rng.integers(0, 1 << 24)),
                    int(rng.integers(0, 1 << 31)),
                    int(rng.integers(0, 1 << 31)),
                    int(rng.integers(0, 1 << 31)),
                    int(rng.integers(0, 1 << 31)),
                )
                for _ in range(rc)
            ]
            want = cref.gen_sr(sr, rrs)
            got = py_rtcp.gen_sr(
                py_rtcp.RTCPSenderReport(
                    ssrc=sr[0], ntp_timestamp=sr[1], rtp_timestamp=sr[2],
                    packet_count=sr[3], byte_count=sr[4],
                ),
                [
                    py_rtcp.RTCPReceiverReport(
                        ssrc=r[0], lost_fract=r[1], lost_packets=r[2],
                        highest_seq=r[3], jitter=r[4], lsr=r[5], dlsr=r[6],
                    )
                    for r in rrs
                ],
            )
            assert got == want

    def test_rr_fuzz(self):
        rng = _rng()
        for _ in range(100):
            rc = int(rng.integers(0, 5))
            ssrc = int(rng.integers(0, 1 << 32))
            rrs = [
                tuple(int(rng.integers(0, 1 << 24)) for _ in range(7))
                for _ in range(rc)
            ]
            want = cref.gen_rr(ssrc, rrs)
            got = py_rtcp.gen_rr(
                ssrc,
                [
                    py_rtcp.RTCPReceiverReport(
                        ssrc=r[0], lost_fract=r[1], lost_packets=r[2],
                        highest_seq=r[3], jitter=r[4], lsr=r[5], dlsr=r[6],
                    )
                    for r in rrs
                ],
            )
            assert got == want

    def test_sdes_fuzz(self):
        rng = _rng()
        for _ in range(100):
            sc = int(rng.integers(0, 4))
            ssrc = int(rng.integers(0, 1 << 32))
            items = [
                (
                    int(rng.integers(1, 9)),
                    bytes(
                        rng.integers(32, 127, size=int(rng.integers(0, 40)),
                                     dtype=np.uint8)
                    ),
                )
                for _ in range(sc)
            ]
            want = cref.gen_sdes(ssrc, items)
            got = py_rtcp.gen_sdes(
                ssrc,
                [py_rtcp.SDESItem(type=t, message=m) for t, m in items],
            )
            assert got == want

    def test_bye_fuzz(self):
        rng = _rng()
        for sc in (0, 1, 2, 5, 31):
            ssrcs = [int(v) for v in rng.integers(0, 1 << 32, size=sc)]
            assert py_rtcp.gen_bye(ssrcs) == cref.gen_bye(ssrcs)

    def test_radio_sr_sdes_packet(self):
        """The exact SR+SDES compound packet radio emits once per second
        (main.c:442-513): byte-identical between C and Python."""
        sr = (0x12345678, (3896000000 << 32) | 0x80000000, 48000 * 100,
              5000, 5000 * 960)
        want = cref.gen_sr(sr, []) + cref.gen_sdes(
            0x12345678, [(1, b"radio@host"), (6, b"ka9q-radio")]
        )
        got = py_rtcp.gen_sr(
            py_rtcp.RTCPSenderReport(
                ssrc=sr[0], ntp_timestamp=sr[1], rtp_timestamp=sr[2],
                packet_count=sr[3], byte_count=sr[4],
            )
        ) + py_rtcp.gen_sdes(
            0x12345678,
            [
                py_rtcp.SDESItem(type=py_rtcp.SDESType.CNAME,
                                 message=b"radio@host"),
                py_rtcp.SDESItem(type=py_rtcp.SDESType.TOOL,
                                 message=b"ka9q-radio"),
            ],
        )
        assert got == want


# =================================================================== AX.25

def _random_frame(rng, ndigi=None) -> bytes:
    """A plausible AX.25 UI frame with valid address structure + CRC."""
    calls = ["KA9Q", "N0CALL-7", "WIDE1-1", "WIDE2-2", "APRS", "W1AW-15"]
    if ndigi is None:
        ndigi = int(rng.integers(0, 9))
    dest = py_ax25.encode_callsign(str(rng.choice(calls)))
    src = py_ax25.encode_callsign(str(rng.choice(calls)))
    addrs = bytearray(dest + src)
    for i in range(ndigi):
        last = i == ndigi - 1
        addrs += py_ax25.encode_callsign(
            str(rng.choice(calls)), last=last, h=bool(rng.integers(0, 2))
        )
    if ndigi == 0:
        addrs[-1] |= 1
    info = bytes(
        rng.integers(0, 256, size=int(rng.integers(0, 60)), dtype=np.uint8)
    )
    return py_ax25.append_crc(bytes(addrs) + bytes([0x03, 0xF0]) + info)


class TestAX25:
    def test_crc_fuzz(self):
        rng = _rng()
        for _ in range(200):
            n = int(rng.integers(0, 80))
            data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
            assert py_ax25.crc_good(data) == cref.crc_good(data)
        # frames built with append_crc must pass the C CRC
        for _ in range(50):
            f = _random_frame(rng)
            assert cref.crc_good(f)

    def test_base91_fuzz(self):
        rng = _rng()
        for _ in range(100):
            data = bytes(rng.integers(33, 124, size=4, dtype=np.uint8))
            assert py_ax25.decode_base91(data) == cref.decode_base91(data)

    def test_parse_valid_frames(self):
        rng = _rng()
        for _ in range(200):
            f = _random_frame(rng)
            # C parses WITHOUT the CRC included in len?  No: packet.c:359
            # passes the full frame incl. CRC and ax25.c subtracts 2.
            want = cref.ax25_parse(f)
            got = py_ax25.ax25_parse(f)
            if want is None:
                assert got is None
                continue
            assert got is not None
            assert got.source == want["source"]
            assert got.dest == want["dest"]
            assert got.control == want["control"]
            assert got.type == want["type"]
            assert got.information == want["information"]
            assert [(n, h) for n, h in got.digipeaters] == want[
                "digipeaters"
            ]

    def test_parse_mutated_frames(self):
        """Bit-flipped frames: both parsers must agree on accept/reject
        and on the parse when both accept."""
        rng = _rng()
        for _ in range(300):
            f = bytearray(_random_frame(rng))
            nmut = int(rng.integers(1, 5))
            for _ in range(nmut):
                pos = int(rng.integers(0, len(f)))
                f[pos] ^= 1 << int(rng.integers(0, 8))
            want = cref.ax25_parse(bytes(f))
            got = py_ax25.ax25_parse(bytes(f))
            assert (got is None) == (want is None), bytes(f).hex()
            if want is not None:
                assert got.source == want["source"]
                assert got.dest == want["dest"]
                assert got.information == want["information"]

    def test_parse_truncated(self):
        rng = _rng()
        base = _random_frame(rng, ndigi=2)
        for n in range(0, len(base)):
            want = cref.ax25_parse(base[:n])
            got = py_ax25.ax25_parse(base[:n])
            assert (got is None) == (want is None), n
            if want is not None:
                assert got.information == want["information"], n


# ============================================================ modes table

def _mode_by_name(cmodes: list[dict], name: str) -> dict | None:
    for m in cmodes:
        if m["name"].upper() == name.upper():
            return m
    return None


class TestModesTable:
    def test_shipped_modes_txt(self):
        cmodes = cref.readmodes(DATA_DIR, "modes.txt")
        pymodes = py_modes.load_modes(f"{DATA_DIR}/modes.txt")
        assert len(cmodes) == len(pymodes)
        demod_names = {0: "LINEAR", 1: "AM", 2: "FM"}
        for name, pm in pymodes.items():
            cm = _mode_by_name(cmodes, name)
            assert cm is not None, name
            assert demod_names[cm["demod_type"]] == pm.demod
            assert cm["low"] == pytest.approx(pm.low)
            assert cm["high"] == pytest.approx(pm.high)
            assert cm["shift"] == pytest.approx(pm.shift)
            assert cm["attack_rate"] == pytest.approx(pm.attack_rate)
            assert cm["recovery_rate"] == pytest.approx(pm.recovery_rate)
            assert cm["hangtime"] == pytest.approx(pm.hangtime)
            assert cm["pll"] == pm.pll
            assert cm["square"] == pm.square
            assert cm["isb"] == pm.isb
            assert cm["flat"] == pm.flat
            assert cm["channels"] == pm.channels

    def test_edge_case_table(self, tmp_path):
        """Swapped edges, sign coercion of AGC rates, every option word,
        mixed case, comments."""
        table = (
            "# comment line\n"
            "T1 FM +8000 -8000 0 50 -50 -2.5\n"       # swapped + signs
            "T2 linear -100 100 700 -50 6 1.1 ISB Mono\n"
            "T3 Linear -5000 5000 0 -50 6 1.1 square\n"
            "T4 AM -5000 5000 0 -50 50 0 stereo # trailing comment\n"
            "T5 linearISH -1 1 0 0 0 0\n"              # prefix demod match
            "BAD nosuchdemod -1 1 0 0 0 0\n"
        )
        (tmp_path / "modes.txt").write_text(table)
        cmodes = cref.readmodes(str(tmp_path), "modes.txt")
        pymodes = py_modes.parse_modes(table)
        assert len(cmodes) == len(pymodes)
        for name, pm in pymodes.items():
            cm = _mode_by_name(cmodes, name)
            assert cm is not None, name
            assert cm["low"] == pytest.approx(pm.low), name
            assert cm["high"] == pytest.approx(pm.high), name
            assert cm["attack_rate"] == pytest.approx(pm.attack_rate)
            assert cm["recovery_rate"] == pytest.approx(pm.recovery_rate)
            assert cm["hangtime"] == pytest.approx(pm.hangtime)
            assert cm["isb"] == pm.isb and cm["pll"] == pm.pll
            assert cm["square"] == pm.square
            assert cm["channels"] == pm.channels


# ================================================================ bandplan

class TestBandplan:
    def test_shipped_bandplan_txt(self):
        cplans = cref.load_bandplan(DATA_DIR)
        pyplan = py_bandplan.Bandplan.load(f"{DATA_DIR}/bandplan.txt")
        assert len(cplans) == len(pyplan.entries)
        for ce, pe in zip(cplans, sorted(pyplan.entries,
                                         key=lambda e: e.lower)):
            assert ce["lower"] == pytest.approx(pe.lower), pe.name
            assert ce["upper"] == pytest.approx(pe.upper), pe.name
            assert ce["classes"] == pe.classes, pe.name
            assert ce["modes"] == pe.modes, pe.name
            assert ce["name"].strip() == pe.name.strip()

    def test_lookup_fuzz(self):
        cref.load_bandplan(DATA_DIR)
        pyplan = py_bandplan.Bandplan.load(f"{DATA_DIR}/bandplan.txt")
        rng = _rng()
        freqs = [float(v) for v in rng.uniform(0, 1300e6, 400)] + [
            147.435e6, 14.074e6, 7.0e6, 0.472e6, 1296.0e6, 1e3,
        ]
        for f in freqs:
            want = cref.lookup_frequency(f)
            got = pyplan.lookup(f)
            assert (got is None) == (want is None), f
            if want is not None:
                assert got.lower == pytest.approx(want["lower"]), f
                assert got.upper == pytest.approx(want["upper"]), f
                assert got.classes == want["classes"], f
                assert got.modes == want["modes"], f
