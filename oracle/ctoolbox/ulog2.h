/* Clean-room shim: floor(log2(x)) for uint32, x>0. */
#ifndef CTOOLBOX_SHIM_ULOG2_H
#define CTOOLBOX_SHIM_ULOG2_H
#include "ctoolbox.h"
static inline uintxx ctb_u32log2(uint32 x) { return 31 - __builtin_clz(x); }
#endif
