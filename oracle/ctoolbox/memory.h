/* Clean-room shim: allocator interface per reference usage
 * (request/dispose/user, ctb_getdefaultallocator, ctb_memcpy). */
#ifndef CTOOLBOX_SHIM_MEMORY_H
#define CTOOLBOX_SHIM_MEMORY_H
#include "ctoolbox.h"
#include <stdlib.h>

struct TAllocator {
	void* (*request)(uintxx size, void* user);
	void  (*dispose)(void* ptr, uintxx size, void* user);
	void* user;
};
typedef struct TAllocator TAllocator;

static void* ctb_shim_request_(uintxx n, void* u) { (void) u; return malloc(n); }
static void  ctb_shim_dispose_(void* p, uintxx n, void* u) { (void) n; (void) u; free(p); }

static inline const TAllocator*
ctb_getdefaultallocator(void)
{
	static const TAllocator a = { ctb_shim_request_, ctb_shim_dispose_, 0 };
	
	return &a;
}

#define ctb_memcpy(d, s, n) memcpy((d), (s), (n))
#endif
