/* Oracle CLI: compress/decompress via the reference jdeflate library.
 * Usage: jdeflate_cli c <level> <in >out   (raw deflate)
 *        jdeflate_cli d <in >out           (raw inflate)
 *        jdeflate_cli cz/cg <level>        (zlib / gzip via zstrm)  */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jdeflate/deflator.h>
#include <jdeflate/inflator.h>
#include <jdeflate/zstrm.h>

static uint8* readall(FILE* f, size_t* n) {
	size_t cap = 1 << 20, len = 0;
	uint8* b = malloc(cap);
	size_t r;
	while ((r = fread(b + len, 1, cap - len, f)) > 0) {
		len += r;
		if (len == cap) { cap *= 2; b = realloc(b, cap); }
	}
	*n = len;
	return b;
}

int main(int argc, char** argv) {
	size_t n;
	uint8* in = readall(stdin, &n);
	static uint8 out[1 << 22];
	if (argv[1][0] == 'c' && argv[1][1] == 0) {
		TDeflator* d = deflator_create(0, atoi(argv[2]), NULL);
		deflator_setsrc(d, in, n);
		for (;;) {
			deflator_settgt(d, out, sizeof(out));
			uintxx r = deflator_deflate(d, DEFLT_END);
			fwrite(out, 1, deflator_tgtend(d), stdout);
			if (r == DEFLT_OK) break;
			if (r != DEFLT_TGTEXHSTD) { fprintf(stderr, "err %d\n", (int) r); return 1; }
		}
		deflator_destroy(d);
	}
	else if (argv[1][0] == 'd' && argv[1][1] == 0) {
		TInflator* i = inflator_create(0, NULL);
		inflator_setsrc(i, in, n);
		for (;;) {
			inflator_settgt(i, out, sizeof(out));
			uintxx r = inflator_inflate(i, 1);
			fwrite(out, 1, inflator_tgtend(i), stdout);
			if (r == INFLT_OK) break;
			if (r != INFLT_TGTEXHSTD) { fprintf(stderr, "err %d\n", (int) r); return 1; }
		}
		inflator_destroy(i);
	}
	else { fprintf(stderr, "bad mode\n"); return 2; }
	free(in);
	return 0;
}
