/* Minimal clean-room ctoolbox shim — just enough to compile the reference
 * jdeflate sources as a TEST ORACLE for this framework (the ctoolbox
 * subproject is a network wrap and this environment has no egress).
 * Interface reconstructed from usage sites in the reference only. */
#ifndef CTOOLBOX_SHIM_H
#define CTOOLBOX_SHIM_H

#include <stdint.h>
#include <stddef.h>
#include <string.h>
#include <assert.h>

typedef uint8_t  uint8;
typedef uint16_t uint16;
typedef uint32_t uint32;
typedef uint64_t uint64;
typedef int8_t   int8;
typedef int16_t  int16;
typedef int32_t  int32;
typedef int64_t  int64;
typedef size_t    uintxx;
typedef ptrdiff_t intxx;
typedef uint32    flag32;
typedef int       bool_ctb;
#ifndef __cplusplus
#ifndef bool
#define bool int
#endif
#endif

#define CTB_INLINE static inline
#define CTB_FORCEINLINE static inline __attribute__((always_inline))
#define CTB_ASSERT(x) assert(x)
#define CTB_EXPECT1(x) __builtin_expect(!!(x), 1)
#define CTB_EXPECT0(x) __builtin_expect(!!(x), 0)
#define CTB_CONSTCAST(value) ((void*) (uintptr_t) (const void*) (value))

#if UINTPTR_MAX > 0xffffffffu
#define CTB_ENV64 1
#endif
#define CTB_FASTUNALIGNED 1
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ == __ORDER_BIG_ENDIAN__
#define CTB_IS_BIGENDIAN 1
#define CTB_SWAP32ONBE(x) __builtin_bswap32(x)
#define CTB_SWAP64ONBE(x) __builtin_bswap64(x)
#define CTB_SWAP32ONLE(x) (x)
#else
#define CTB_IS_LITTLEENDIAN 1
#define CTB_SWAP32ONBE(x) (x)
#define CTB_SWAP64ONBE(x) (x)
#define CTB_SWAP32ONLE(x) __builtin_bswap32(x)
#endif

#endif
