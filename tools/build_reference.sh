#!/bin/sh
# Build the *reference* liblizard (from /root/reference, read-only) as a shared
# library used ONLY as a test oracle (golden generation + interop tests).
# Build artifacts land in /root/repo/.ref_build (gitignored). No reference
# sources are copied into this repo.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/root/repo/.ref_build}
mkdir -p "$OUT"

# Two builds: -O3 (primary oracle) and -O0 (compression-parity oracle).
# The reference invokes UB via Lizard_highbit32(0) when pricing rep-matches
# (lizard_compress_liz.h:283 with offset==0); gcc -O3 compiles it to a bare
# BSR whose result on zero input is stale register contents, so -O3 output
# occasionally differs from -O0 at levels 43/45. The -O0 build is the
# well-defined parity target.
SRCS="lib/lizard_compress.c lib/lizard_decompress.c lib/lizard_frame.c \
    lib/entropy/entropy_common.c lib/entropy/fse_compress.c lib/entropy/fse_decompress.c \
    lib/entropy/huf_compress.c lib/entropy/huf_decompress.c \
    lib/xxhash/xxhash.c"

for opt in O3 O0; do
  CFLAGS="-$opt -fPIC -I$REF/lib -I$REF/lib/entropy -I$REF/lib/xxhash -DXXH_NAMESPACE=Lizard_"
  for src in $SRCS; do
    obj="$OUT/${opt}_$(echo "$src" | tr '/' '_' | sed 's/\.c$/.o/')"
    if [ ! -f "$obj" ] || [ "$REF/$src" -nt "$obj" ]; then
      echo "CC [$opt] $src"
      gcc $CFLAGS -c "$REF/$src" -o "$obj"
    fi
  done
  echo "LD liblizard_ref_$opt.so"
  gcc -shared -o "$OUT/liblizard_ref_$opt.so" "$OUT/${opt}_"*.o
done
ln -sf liblizard_ref_O3.so "$OUT/liblizard_ref.so"
echo "OK: $OUT/liblizard_ref.so (+_O0)"
