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

unzip -qo "$SRC/lsgkm.zip"
(cd lsgkm-master/src && make -j4)
cp lsgkm-master/src/gkmtrain lsgkm-master/src/gkmpredict lsgkm-master/bin/

echo "built: gkmsvm/gkmsvm_kernel gkmsvm/gkmsvm_train gkmsvm/gkmsvm_classify"
echo "built: lsgkm-master/bin/gkmtrain lsgkm-master/bin/gkmpredict"
