#!/bin/sh
# Build the *reference* liblizard (from /root/reference, read-only) as a shared
# library used ONLY as a test oracle (golden generation + interop tests).
# Build artifacts land in /root/repo/.ref_build (gitignored). No reference
# sources are copied into this repo.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/root/repo/.ref_build}
mkdir -p "$OUT"

CFLAGS="-O3 -fPIC -I$REF/lib -I$REF/lib/entropy -I$REF/lib/xxhash -DXXH_NAMESPACE=Lizard_"

for src in \
    lib/lizard_compress.c lib/lizard_decompress.c lib/lizard_frame.c \
    lib/entropy/entropy_common.c lib/entropy/fse_compress.c lib/entropy/fse_decompress.c \
    lib/entropy/huf_compress.c lib/entropy/huf_decompress.c \
    lib/xxhash/xxhash.c ; do
  obj="$OUT/$(echo "$src" | tr '/' '_' | sed 's/\.c$/.o/')"
  if [ ! -f "$obj" ] || [ "$REF/$src" -nt "$obj" ]; then
    echo "CC $src"
    gcc $CFLAGS -c "$REF/$src" -o "$obj"
  fi
done

echo "LD liblizard_ref.so"
gcc -shared -o "$OUT/liblizard_ref.so" "$OUT"/*.o
echo "OK: $OUT/liblizard_ref.so"
