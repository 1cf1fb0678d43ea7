/* Stub <bsd/string.h> — libbsd is absent in this image.  Route the two
 * BSD string calls the reference uses to shim implementations so we never
 * collide with any glibc-provided strlcpy/strlcat. */
#ifndef KA9Q_SHIM_BSD_STRING_H
#define KA9Q_SHIM_BSD_STRING_H 1

#include <string.h>
#include <stddef.h>

size_t ka9q_shim_strlcpy(char *dst, const char *src, size_t siz);
size_t ka9q_shim_strlcat(char *dst, const char *src, size_t siz);

#define strlcpy ka9q_shim_strlcpy
#define strlcat ka9q_shim_strlcat

#endif
