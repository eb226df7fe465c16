#!/bin/sh
# Build the third-party baseline tools from the sources the reference
# vendors (results/baselines/). Nothing is vendored into this repo; the
# extraction + build is reproducible from the read-only reference tree.
#
#   sh tools/baselines/build.sh
#
# Produces:
#   tools/baselines/gkmsvm/gkmsvm_{kernel,train,classify}   (gkmSVM-2.0)
#   tools/baselines/lsgkm-master/bin/{gkmtrain,gkmpredict}  (LSGKM)
#
# Not buildable here: GaKCo (source not vendored by the reference) and
# the String_Kernels blended-spectrum package (JVM; no java runtime in
# this image). Their runners stay stub-validated
# (tests/test_baseline_runners.py).
set -e
cd "$(dirname "$0")"
SRC=/root/reference/results/baselines

tar xzf "$SRC/gkmsvm-2.0.tar.gz"
(cd gkmsvm && make -j4)

# Protein build: gkmSVM-2.0 hardcodes MAX_ALPHABET_SIZE 4 (DNA) in
# global.h; the reference's protein runs recompile with 24 and pass
# -A protein.dictionary.txt (results/run_experiments.py:314-322,
# global.h:26-27 documents exactly this switch).
rm -rf gkmsvm-prot
mkdir gkmsvm-prot
tar xzf "$SRC/gkmsvm-2.0.tar.gz" -C gkmsvm-prot --strip-components=1
sed -i 's|^#define MAX_ALPHABET_SIZE 4 .*|#define MAX_ALPHABET_SIZE 24 /*protein build; see global.h:27*/|' gkmsvm-prot/src/global.h
sed -i 's|^#define NBITS 2 .*|#define NBITS 5 /*ceiling log2 MAX_ALPHABET_SIZE (protein build)*/|' gkmsvm-prot/src/global.h
grep -q "MAX_ALPHABET_SIZE 24" gkmsvm-prot/src/global.h
grep -q "NBITS 5" gkmsvm-prot/src/global.h
(cd gkmsvm-prot && make -j4)

unzip -qo "$SRC/lsgkm.zip"
(cd lsgkm-master/src && make -j4)
cp lsgkm-master/src/gkmtrain lsgkm-master/src/gkmpredict lsgkm-master/bin/

echo "built: gkmsvm/gkmsvm_kernel gkmsvm/gkmsvm_train gkmsvm/gkmsvm_classify"
echo "built: lsgkm-master/bin/gkmtrain lsgkm-master/bin/gkmpredict"
