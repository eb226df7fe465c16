#!/bin/sh
# Build the reference-oracle kernel dumper against the UNMODIFIED reference
# C++ engine sources (read-only checkout at /root/reference). The resulting
# binary computes the reference's exact normalized kernel for a fasta pair
# and prints it at full float64 round-trip precision (%.17g).
set -e
REF=${REF:-/root/reference/src/fastsk/_fastsk}
cd "$(dirname "$0")"
g++ -O3 -march=native -I "$REF" dump_kernel.cpp \
    "$REF/shared.cpp" "$REF/fastsk_kernel.cpp" \
    -o dump_kernel -lpthread
g++ -O3 -march=native -I "$REF" bench_main.cpp \
    "$REF/shared.cpp" "$REF/fastsk_kernel.cpp" \
    -o bench_main -lpthread
# --wrap=malloc: see the header comment in svm_oracle.cpp (works around a
# latent heap overflow in the fork's never-exercised svm_load_model)
g++ -O2 -I "$REF" svm_oracle.cpp \
    "$REF/libsvm-code/svm.cpp" \
    -Wl,--wrap=malloc -o svm_oracle -lpthread
echo "built $(pwd)/dump_kernel, $(pwd)/bench_main and $(pwd)/svm_oracle"
