"""Dual-stack multicast (setup_mcast PF_UNSPEC loop, multicast.c:160-217).

The reference's setup_mcast resolves with hints.ai_family = PF_UNSPEC and
takes the first family that creates + connects/binds, with per-family
joins (ip_mreq vs ipv6_mreq, multicast.c:58-101).  These tests exercise
the rebuilt Python path and the native C++ engine over real v4 and v6
loopback groups (the container has ::1 + a global fd00::/64 on eth0).

IPv6 multicast loopback needs a scope for link-local (ff02::) groups;
wider scopes (ff05:: site-local and up) bind unscoped.  Skips cleanly if
the kernel has IPv6 disabled.
"""

import socket
import struct

import numpy as np
import pytest

from ka9q_sdr_tpu.net.multicast import _parse_target, setup_mcast


def _ipv6_available() -> bool:
    try:
        s = socket.socket(socket.AF_INET6, socket.SOCK_DGRAM)
    except OSError:
        return False
    try:
        s.bind(("::1", 0))
        return True
    except OSError:
        return False
    finally:
        s.close()


needs_v6 = pytest.mark.skipif(
    not _ipv6_available(), reason="kernel IPv6 disabled")


def _up_iface() -> str | None:
    """First non-loopback interface that is up and multicast-capable
    (link-local groups need a real egress; IFB/down devices are not)."""
    IFF_UP, IFF_MULTICAST = 0x1, 0x1000
    for _idx, name in socket.if_nameindex():
        if name == "lo":
            continue
        try:
            with open(f"/sys/class/net/{name}/flags") as f:
                flags = int(f.read(), 16)
        except OSError:
            continue
        if flags & IFF_UP and flags & IFF_MULTICAST:
            return name
    return None


class TestParseTarget:
    def test_v4_forms(self):
        assert _parse_target("239.1.2.3:5004") == ("239.1.2.3", 5004, None)
        assert _parse_target("239.1.2.3") == ("239.1.2.3", 5004, None)
        assert _parse_target("name:7000,eth0") == ("name", 7000, "eth0")

    def test_v6_bracketed(self):
        assert _parse_target("[ff05::114]:5004") == ("ff05::114", 5004, None)
        assert _parse_target("[ff02::114]:5010,eth0") == (
            "ff02::114", 5010, "eth0")

    def test_v6_bare_literal_default_port(self):
        # >= 2 colons and no bracket: the whole string is the host
        assert _parse_target("ff05::114") == ("ff05::114", 5004, None)
        assert _parse_target("ff02::114%eth0,eth0") == (
            "ff02::114%eth0", 5004, "eth0")


class TestSetupMcastV6:
    @needs_v6
    def test_site_local_loopback(self):
        """ff05:: (site scope) needs no zone; send->recv over loopback."""
        tx = setup_mcast("[ff05::99:1]:56210", output=True, ttl=0)
        rx = setup_mcast("[ff05::99:1]:56210", output=False)
        rx.settimeout(2)
        try:
            tx.send(b"v6-site")
            assert rx.recvfrom(100)[0] == b"v6-site"
        finally:
            tx.close()
            rx.close()

    @needs_v6
    def test_link_local_with_iface(self):
        """ff02:: needs a zone: the ',iface' suffix folds into RFC 4007."""
        ifname = _up_iface()
        if ifname is None:
            pytest.skip("no up multicast-capable interface")
        tx = setup_mcast(f"[ff02::99:2]:56211,{ifname}", output=True, ttl=0)
        rx = setup_mcast(f"[ff02::99:2]:56211,{ifname}", output=False)
        rx.settimeout(2)
        try:
            tx.send(b"v6-link")
            assert rx.recvfrom(100)[0] == b"v6-link"
        finally:
            tx.close()
            rx.close()

    @needs_v6
    def test_link_local_without_iface_fails_loudly(self):
        """An unscoped link-local bind is EINVAL in the kernel; the error
        must say so and name the fix (not fall back to a wildcard)."""
        with pytest.raises(OSError, match="interface"):
            setup_mcast("[ff02::99:3]:56212", output=False)

    @needs_v6
    def test_offset_applies_to_v6(self):
        """Status/command port arithmetic (+2) is family-independent."""
        rx = setup_mcast("[ff05::99:4]:56213", output=False, offset=2)
        try:
            assert rx.getsockname()[1] == 56215
            assert rx.family == socket.AF_INET6
        finally:
            rx.close()

    def test_v4_regression(self):
        """The v4 path through the PF_UNSPEC loop is unchanged."""
        tx = setup_mcast("239.66.210.1:56214", output=True, ttl=0)
        rx = setup_mcast("239.66.210.1:56214", output=False)
        rx.settimeout(2)
        try:
            tx.send(b"v4-still")
            assert rx.recvfrom(100)[0] == b"v4-still"
        finally:
            tx.close()
            rx.close()


class TestNativeDualStack:
    """The C++ engine's resolve/join helpers (rtp_engine.cc resolve_udp,
    join_own_group) mirror the same PF_UNSPEC semantics."""

    @needs_v6
    def test_native_v6_roundtrip(self):
        from ka9q_sdr_tpu.native import NATIVE_AVAILABLE, RTPReceiver, \
            RTPSender

        if not NATIVE_AVAILABLE:
            pytest.skip("no compiler")
        rx = RTPReceiver("ff05::99:5", 56216, block_len=240)
        tx = RTPSender("ff05::99:5", 56216, samprate=48000, ttl=0)
        iq = np.zeros(240 * 4 * 2, np.int16)
        iq[0::2] = 1000
        try:
            tx.send(iq, pkt_samples=240, realtime=False)
            got = sum(
                1 for _ in range(4) if rx.get_block(1000) is not None)
            s = rx.stats()
            assert got == 4, s
            assert s["drops"] == 0 and s["gap_samples"] == 0
        finally:
            rx.close()
            tx.close()

    def test_native_resolve_tries_every_family(self):
        """(r4 review) A dual-stack name must yield ALL its numeric forms
        so wrapper constructors can fall through families like the
        reference's PF_UNSPEC loop — resolving only the first result
        strands a v6-first name on a v4-only path."""
        from ka9q_sdr_tpu.native import _resolve_candidates

        cands = _resolve_candidates("localhost")
        assert "127.0.0.1" in cands
        # dedup + order preserved
        assert len(cands) == len(set(cands))

    def test_native_rx_single_block_ring(self):
        """(r4 review) ring_blocks=1 must not be a permanently deaf
        receiver: the ring keeps one slot of writer/reader gap (capacity
        nblocks-1), so the floor is silently raised to 2."""
        from ka9q_sdr_tpu.native import NATIVE_AVAILABLE, RTPReceiver, \
            RTPSender

        if not NATIVE_AVAILABLE:
            pytest.skip("no compiler")
        rx = RTPReceiver("239.66.210.7", 56217, block_len=240,
                         ring_blocks=1)
        tx = RTPSender("239.66.210.7", 56217, samprate=48000, ttl=0)
        iq = np.zeros(240 * 2 * 2, np.int16)
        iq[0::2] = 500
        try:
            tx.send(iq, pkt_samples=240, realtime=False)
            assert rx.get_block(1000) is not None, (
                "1-block ring is deaf: " + str(rx.stats()))
        finally:
            rx.close()
            tx.close()

    def test_bare_v6_with_plausible_port_warns(self, capsys):
        """'ff05::114:5006' is a VALID v6 address and also what an
        operator types meaning group ff05::114 port 5006 — the parse
        keeps the address reading but must say so on stderr with the
        bracketed fix."""
        host, port, _ = _parse_target("ff05::114:5006")
        assert host == "ff05::114:5006" and port == 5004
        err = capsys.readouterr().err
        assert "[ff05::114]:5006" in err
        # an unambiguous literal (trailing group not a plausible port)
        _parse_target("ff05::99999")
        _parse_target("[ff05::114]:5006")
        assert "write" not in capsys.readouterr().err

    @needs_v6
    def test_native_resolve_preserves_zone(self):
        from ka9q_sdr_tpu.native import _resolve_group

        ifname = _up_iface()
        if ifname is None:
            pytest.skip("no up multicast-capable interface")
        ifidx = socket.if_nametoindex(ifname)
        r = _resolve_group(f"ff02::99:6%{ifname}")
        assert r.startswith("ff02::99:6%")
        assert r.rsplit("%", 1)[1] in (ifname, str(ifidx))
        # unscoped + v4 + names unchanged
        assert _resolve_group("ff05::99:6") == "ff05::99:6"
        assert _resolve_group("239.1.2.3") == "239.1.2.3"
        assert _resolve_group("localhost") in ("127.0.0.1", "::1")
