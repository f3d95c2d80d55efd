#!/bin/bash
# Build the reference binary into .refbuild/ using the refshim/ stand-ins
# for boost and htslib (neither library nor its source exists in this
# environment; only the reference's bundled htslib *headers* do).
#
# Everything algorithmic in the resulting binary is the reference's own
# genuine code; the shim supplies IO codecs (BGZF/BAM/FASTA/VCF text),
# CLI parsing, and thread-pool plumbing. See refshim/hts_shim/*.c headers.
#
# Usage: bash refshim/build_harness.sh [--clean]
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF_SRC=/root/reference
BUILD_ROOT="$REPO/.refbuild"
REF="$BUILD_ROOT/ref"

if [ "$1" = "--clean" ]; then
    rm -rf "$REF"
fi

if [ ! -d "$REF" ]; then
    mkdir -p "$BUILD_ROOT"
    cp -r "$REF_SRC" "$REF"
    # point the build at the mini-boost headers and use 2 jobs
    sed -i 's|^set(CMAKE_MODULE_PATH ${CMAKE_SOURCE_DIR}/cmake)|set(CMAKE_MODULE_PATH ${CMAKE_SOURCE_DIR}/cmake)\ninclude_directories(SYSTEM '"$REPO"'/refshim/boost_mini)|' \
        "$REF/CMakeLists.txt"
    sed -i 's/^JOBS=32/JOBS=2/' "$REF/build_dev.sh"
    sed -i 's|set(PACK_LINK_LIB ${PACK_LINK_LIB} ${LIB_PATH}/libboost_program_options.so.1.83.0)|# harness: program_options comes from the header-only mini-boost shim|' "$REF/src/CMakeLists.txt"
    # reference bug fix: HaplotypeCaller::apply_bqsr_ is an uninitialized
    # member pointer; garbage non-null selects the never-created BQSR
    # stream (haplotypecaller.cpp:109) and the dispatch thread derefs null
    sed -i 's|    : hc_args(nullptr)|    : hc_args(nullptr)\n    , apply_bqsr_(nullptr) /* harness fix: uninitialized member (UB) */|' "$REF/src/haplotypecaller/haplotypecaller.cpp"
    sed -i 's|cmake -DCMAKE_INSTALL_PREFIX|cmake -DBoost_INCLUDE_DIRS='"$REPO"'/refshim/boost_mini -DCMAKE_INSTALL_PREFIX|' \
        "$REF/build_dev.sh"
fi

# 1. shim libhts
HTSINC="$REF/third_lib/htslib/include"
mkdir -p "$REF/third_lib/htslib/lib"
echo "building hts shim..."
gcc -shared -fPIC -O2 -g -Wl,-soname,libhts.so.3 -o "$REF/third_lib/htslib/lib/libhts.so.1.18-1-g6dbcddf" \
    "$REPO"/refshim/hts_shim/shim_*.c -I"$HTSINC" -lz -lpthread

# 2. reference build (full cmake configure + build)
cd "$REF"
if [ ! -d build-dev ]; then
    bash build_dev.sh
else
    # refresh the copied libhts inside the build tree, then incremental make
    rm -f build-dev/bin/libhts.so.3
    cp third_lib/htslib/lib/libhts.so.1.18-1-g6dbcddf build-dev/bin/libhts.so.3
    (cd build-dev && make -j2 && make install)
fi

echo "reference binary: $REF/release-dev/bin or $REF/build-dev/bin"
ls -la "$REF/build-dev/bin/" | head -20

# 3. golden harnesses: drive the reference's genuine engines directly
BIN="$BUILD_ROOT/bin"
mkdir -p "$BIN"
HC="$REF/src/haplotypecaller"
LIBDIR="$REF/build-dev/bin"
echo "building pairhmm_harness..."
g++ -std=c++17 -O2 -g -o "$BIN/pairhmm_harness" \
    "$REPO/refshim/pairhmm_harness.cpp" \
    -I"$HC/pairhmm" -I"$HC/genotype" -I"$HC/common" -I"$HC/common/utils" \
    -I"$HC/common/base/include" -I"$HC" \
    -I"$REF/third_lib/htslib/include" \
    -I"$REF/third_lib/spdlog/include" \
    -I"$REF/src/rovaca_logger" -I"$REF/src" \
    -I"$REPO/refshim/boost_mini" \
    -L"$LIBDIR" -Wl,-rpath,"$LIBDIR" \
    -lpairhmm -lgenotype -lutils -lbase -llogger \
    -l:libhts.so.3 -lz -lpthread
echo "harness: $BIN/pairhmm_harness"

echo "building assemble_harness + region_harness..."
for H in assemble_harness region_harness; do
    g++ -std=c++17 -O2 -g -o "$BIN/$H" "$REPO/refshim/$H.cpp" \
        -I"$HC/apply" -I"$HC/apply/common" -I"$HC/apply/include" \
        -I"$HC/apply/include/assemble" -I"$HC/common/assemble" \
        -I"$HC/genotype" -I"$HC/pairhmm" -I"$HC/common" -I"$HC/common/utils" \
        -I"$HC/common/base/include" -I"$HC" \
        -I"$REF/third_lib/htslib/include" \
        -I"$REF/third_lib/spdlog/include" \
        -I"$REF/src/rovaca_logger" -I"$REF/src" \
        -I"$REPO/refshim/boost_mini" \
        -L"$LIBDIR" -Wl,-rpath,"$LIBDIR" \
        -lassemble -lgenotype -lpairhmm -lutils -lbase -llogger \
        -l:libhts.so.3 -lz -lpthread
    echo "harness: $BIN/$H"
done
