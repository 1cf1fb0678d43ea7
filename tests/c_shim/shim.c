/* Differential-test shim around the reference's FFTW-free protocol TUs.
 *
 * Compiled at test time together with the (read-only) reference sources
 *   status.c multicast.c rtcp.c ax25.c modes.c bandplan.c misc.c
 * into one shared object that tests/c_ref.py loads with ctypes.  The
 * reference C is the byte-format ground truth; this file only supplies
 * the globals/stubs those TUs need to link and flat-argument wrappers
 * around the struct-typed entry points (so ctypes never has to guess
 * bitfield layout).
 *
 * Nothing here is shipped; it exists so tests/test_c_parity.py can fuzz
 * the Python codecs against the real C byte-for-byte.
 */
#define _GNU_SOURCE 1
#include <stdint.h>
#include <string.h>
#include <stddef.h>

#include "multicast.h"
#include "status.h"

/* ---- BSD string routines (libbsd absent; see stub/bsd/string.h) ---- */

size_t ka9q_shim_strlcpy(char *dst, const char *src, size_t siz) {
  size_t slen = strlen(src);
  if (siz > 0) {
    size_t n = slen >= siz ? siz - 1 : slen;
    memcpy(dst, src, n);
    dst[n] = '\0';
  }
  return slen;
}

size_t ka9q_shim_strlcat(char *dst, const char *src, size_t siz) {
  size_t dlen = strnlen(dst, siz);
  size_t slen = strlen(src);
  if (dlen == siz)
    return siz + slen;
  size_t n = slen >= siz - dlen ? siz - dlen - 1 : slen;
  memcpy(dst + dlen, src, n);
  dst[dlen + n] = '\0';
  return dlen + slen;
}

/* ---- globals the reference TUs reference but main.c defines ---- */

char Libdir[4096] = "/usr/local/share/ka9q-radio";

void shim_set_libdir(const char *dir) {
  ka9q_shim_strlcpy(Libdir, dir, sizeof(Libdir));
}

/* The three demod thread entry points (fm.c/am.c/linear.c) are compiled
 * for real since r5 — driven by shim_demod.c. */

/* ---- RTP header marshal wrappers (rtp_header has int:1 bitfields;
 *      flatten to a uint32 field array so ctypes stays layout-free).
 *      Field order: version,pad,extension,cc,marker,type,seq,timestamp,
 *      ssrc,csrc[0..14]  (24 words total). ---- */

int shim_ntoh_rtp(unsigned char *data, uint32_t *f) {
  struct rtp_header h;
  memset(&h, 0, sizeof(h));
  unsigned char *end = ntoh_rtp(&h, data);
  f[0] = (uint32_t)h.version;
  f[1] = (uint32_t)(h.pad & 1);
  f[2] = (uint32_t)(h.extension & 1);
  f[3] = (uint32_t)h.cc;
  f[4] = (uint32_t)(h.marker & 1);
  f[5] = h.type;
  f[6] = h.seq;
  f[7] = h.timestamp;
  f[8] = h.ssrc;
  for (int i = 0; i < 15; i++)
    f[9 + i] = h.csrc[i];
  return (int)(end - data);
}

int shim_hton_rtp(unsigned char *out, const uint32_t *f) {
  struct rtp_header h;
  memset(&h, 0, sizeof(h));
  h.version   = (int)f[0];
  h.pad       = f[1] & 1;
  h.extension = f[2] & 1;
  h.cc        = (int)f[3];
  h.marker    = f[4] & 1;
  h.type      = (uint8_t)f[5];
  h.seq       = (uint16_t)f[6];
  h.timestamp = f[7];
  h.ssrc      = f[8];
  for (int i = 0; i < 15; i++)
    h.csrc[i] = f[9 + i];
  unsigned char *end = hton_rtp(out, &h);
  return (int)(end - out);
}

/* ---- rtp_process wrapper; state as an int64 array:
 *      [ssrc, init, seq, timestamp, packets, bytes, drops, dupes] ---- */

long long shim_rtp_process(long long *st, uint32_t ssrc, uint32_t seq,
                           uint32_t timestamp, int sampcnt) {
  struct rtp_state s;
  memset(&s, 0, sizeof(s));
  s.ssrc      = (uint32_t)st[0];
  s.init      = (int)st[1];
  s.seq       = (uint16_t)st[2];
  s.timestamp = (uint32_t)st[3];
  s.packets   = st[4];
  s.bytes     = st[5];
  s.drops     = st[6];
  s.dupes     = st[7];

  struct rtp_header h;
  memset(&h, 0, sizeof(h));
  h.ssrc = ssrc;
  h.seq = (uint16_t)seq;
  h.timestamp = timestamp;

  int verdict = rtp_process(&s, &h, sampcnt);

  st[0] = s.ssrc;
  st[1] = s.init;
  st[2] = s.seq;
  st[3] = s.timestamp;
  st[4] = s.packets;
  st[5] = s.bytes;
  st[6] = s.drops;
  st[7] = s.dupes;
  return verdict;
}

/* ---- RTCP wrappers; reports flattened to int64 arrays.
 *      sr: [ssrc, ntp_timestamp, rtp_timestamp, packet_count, byte_count]
 *      rr (per entry, 7): [ssrc, lost_fract, lost_packets, highest_seq,
 *                          jitter, lsr, dlsr] ---- */

int shim_gen_sr(unsigned char *out, int bufsize, const long long *sr5,
                const long long *rr7, int rc) {
  struct rtcp_sr sr;
  memset(&sr, 0, sizeof(sr));
  sr.ssrc          = (unsigned int)sr5[0];
  sr.ntp_timestamp = sr5[1];
  sr.rtp_timestamp = (unsigned int)sr5[2];
  sr.packet_count  = (unsigned int)sr5[3];
  sr.byte_count    = (unsigned int)sr5[4];
  struct rtcp_rr rr[32];
  memset(rr, 0, sizeof(rr));
  for (int i = 0; i < rc && i < 32; i++) {
    rr[i].ssrc         = (unsigned int)rr7[7 * i + 0];
    rr[i].lost_fract   = (int)rr7[7 * i + 1];
    rr[i].lost_packets = (int)rr7[7 * i + 2];
    rr[i].highest_seq  = (int)rr7[7 * i + 3];
    rr[i].jitter       = (int)rr7[7 * i + 4];
    rr[i].lsr          = (int)rr7[7 * i + 5];
    rr[i].dlsr         = (int)rr7[7 * i + 6];
  }
  unsigned char *end = gen_sr(out, bufsize, &sr, rr, rc);
  return end == NULL ? -1 : (int)(end - out);
}

int shim_gen_rr(unsigned char *out, int bufsize, uint32_t ssrc,
                const long long *rr7, int rc) {
  struct rtcp_rr rr[32];
  memset(rr, 0, sizeof(rr));
  for (int i = 0; i < rc && i < 32; i++) {
    rr[i].ssrc         = (unsigned int)rr7[7 * i + 0];
    rr[i].lost_fract   = (int)rr7[7 * i + 1];
    rr[i].lost_packets = (int)rr7[7 * i + 2];
    rr[i].highest_seq  = (int)rr7[7 * i + 3];
    rr[i].jitter       = (int)rr7[7 * i + 4];
    rr[i].lsr          = (int)rr7[7 * i + 5];
    rr[i].dlsr         = (int)rr7[7 * i + 6];
  }
  unsigned char *end = gen_rr(out, bufsize, ssrc, rr, rc);
  return end == NULL ? -1 : (int)(end - out);
}

/* sdes items: parallel arrays of type, mlen, and messages packed 256 B
 * apart (matching struct rtcp_sdes message capacity). */
int shim_gen_sdes(unsigned char *out, int bufsize, uint32_t ssrc,
                  const int *types, const int *mlens,
                  const unsigned char *messages, int sc) {
  struct rtcp_sdes sdes[32];
  memset(sdes, 0, sizeof(sdes));
  for (int i = 0; i < sc && i < 32; i++) {
    sdes[i].type = (enum sdes_type)types[i];
    sdes[i].mlen = mlens[i];
    int n = mlens[i];
    if (n > 0 && n <= 256)
      memcpy(sdes[i].message, messages + 256 * i, n);
  }
  unsigned char *end = gen_sdes(out, bufsize, ssrc, sdes, sc);
  return end == NULL ? -1 : (int)(end - out);
}

int shim_gen_bye(unsigned char *out, int bufsize, const uint32_t *ssrcs,
                 int sc) {
  unsigned char *end = gen_bye(out, bufsize, ssrcs, sc);
  return end == NULL ? -1 : (int)(end - out);
}
