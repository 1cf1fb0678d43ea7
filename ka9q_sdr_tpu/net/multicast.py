"""Multicast socket setup (setup_mcast, multicast.c:136-237).

Same target syntax ("name:port,iface"), same socket options (REUSEPORT/
REUSEADDR, TTL, loopback enabled, EF DSCP), and the same IGMP-snooping
workaround: senders also JOIN the group they transmit to
(multicast.c:208-217), so dumb switches don't flood or drop the stream.
"""

from __future__ import annotations

import socket
import struct
import sys

__all__ = ["setup_mcast", "DEFAULT_MCAST_PORT", "DEFAULT_RTCP_PORT"]

DEFAULT_MCAST_PORT = 5004   # multicast.c:133
DEFAULT_RTCP_PORT = 5005
EF_TOS = 0x2E               # expedited forwarding (multicast.c:15)


def _parse_target(target: str) -> tuple[str, int, str | None]:
    iface = None
    if "," in target:
        target, iface = target.rsplit(",", 1)
    if ":" in target:
        host, port_s = target.rsplit(":", 1)
        port = int(port_s)
    else:
        host, port = target, DEFAULT_MCAST_PORT
    return host, port, iface


def setup_mcast(
    target: str,
    output: bool,
    ttl: int = 1,
    offset: int = 0,
) -> socket.socket:
    """Create a multicast UDP socket (setup_mcast, multicast.c:143-237).

    output=True: connect() to the group so plain send() works.
    output=False: bind() to the group to receive.
    offset is added to the port (status/command = data port + 2;
    RTCP = +1).  Returns the configured socket.
    """
    host, port, iface = _parse_target(target)
    port += offset
    addr = socket.getaddrinfo(
        host, port, socket.AF_INET, socket.SOCK_DGRAM, socket.IPPROTO_UDP
    )[0][4]

    fd = socket.socket(socket.AF_INET, socket.SOCK_DGRAM, socket.IPPROTO_UDP)
    # soptions (multicast.c:18-48)
    fd.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    if not output:
        # Deep receive buffer: the jitted pipeline can stall the reader for
        # a couple of seconds on first-compile; at 6.5 Mb/s that's ~2 MB of
        # I/Q that must queue in the kernel instead of dropping.
        try:
            fd.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 8 << 20)
        except OSError:
            pass
    try:
        fd.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
    except (AttributeError, OSError):
        pass
    fd.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_TTL, ttl)
    fd.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_LOOP, 1)
    try:
        fd.setsockopt(socket.IPPROTO_IP, socket.IP_TOS, EF_TOS << 2)
    except OSError:
        pass

    group = socket.inet_aton(addr[0])
    is_mcast = (addr[0].split(".", 1)[0].isdigit()
                and 224 <= int(addr[0].split(".", 1)[0]) <= 239)

    if output:
        fd.connect(addr)
    else:
        # Bind to the group address itself (as the reference does,
        # multicast.c:197 binds resp->ai_addr): an INADDR_ANY bind would
        # also deliver datagrams addressed to OTHER groups on the same
        # port — e.g. a receiver's own output-status stream arriving on
        # its front-end-status socket.  Fail loudly like the reference
        # instead of silently widening to the wildcard, which would make
        # exactly that self-delivery feedback real on a misconfigured
        # (non-local unicast) target.
        try:
            fd.bind((addr[0], port))
        except OSError as e:
            fd.close()
            raise OSError(
                f"cannot bind receive socket to {addr[0]}:{port} "
                f"(target {target!r}): {e}"
            ) from e

    # Join even when sending (IGMP-snooping workaround, multicast.c:208-217).
    # One ip_mreqn covers both cases: ifindex 0 = kernel-chosen interface.
    if is_mcast:
        try:
            ifidx = socket.if_nametoindex(iface) if iface else 0
        except OSError:
            print(f"multicast: unknown interface {iface!r}; joining on "
                  "the default interface", file=sys.stderr)
            ifidx = 0
        mreq = group + socket.inet_aton("0.0.0.0") + struct.pack("@i", ifidx)
        try:
            fd.setsockopt(socket.IPPROTO_IP, socket.IP_ADD_MEMBERSHIP, mreq)
        except OSError as e:
            # a receiver that can't join is silently deaf on a snooping
            # switch — say so like the reference's perror (multicast.c)
            print(f"multicast: join {addr[0]} failed: {e}", file=sys.stderr)
    return fd
