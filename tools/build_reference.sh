#!/bin/bash
# Out-of-tree build of the DynEarthSol C++ reference (/root/reference, read-only)
# for golden-output generation. Uses the shim headers in tools/refshim/include
# in place of Boost::program_options and nanoflann, which are not installed in
# this container. Mirrors the reference Makefile's g++ flags (opt=2, openmp=1,
# -DSOA; Makefile:236-257,446-488,634-660).
#
# Usage: tools/build_reference.sh [2|3]   (dimensionality; default both)
# Output: refbuild/dynearthsol{2,3}d
set -euo pipefail

REF=/root/reference
REPO="$(cd "$(dirname "$0")/.." && pwd)"
BUILD="$REPO/refbuild"
SHIM="$REPO/tools/refshim/include"
mkdir -p "$BUILD/obj2" "$BUILD/obj3"

CXX=g++
# openmp=0 (README.md:172-173 documents this mode): golden runs must be
# single-threaded for determinism anyway (benchmarks-cores/Makefile:88-89),
# and g++ 12 rejects the reference's OpenMP default(none) pragmas.
BASEFLAGS="-g -std=c++0x -O2 -Wno-unknown-pragmas -DSOA -I$SHIM -I$REF"
LDFLAGS="-lm"

# FPCONTRACT=fast builds a second binary pair (dynearthsol{2,3}d-fma) with
# FMA emission enabled, to match XLA's always-on a*b+c contraction and test
# whether the evp-winkler golden threshold relaxation is really an FMA
# floor (VERDICT r2 weak #3).  -mfma is required: plain x86-64 has no FMA
# instruction, so -ffp-contract alone is a no-op.
SUFFIX=""
if [ "${FPCONTRACT:-}" = "fast" ]; then
    BASEFLAGS="$BASEFLAGS -mfma -ffp-contract=fast"
    SUFFIX="-fma"
fi

SRCS="barycentric-fn ats_output_scheduler brc-interpolation bc binaryio \
dynearthsol earthquake_state fields geometry ic ic-read-temp input matprops \
mesh monitor nn-interpolation output phasechanges remeshing rheology \
runtime_info markerset knn"

build_dim() {
    local ndims=$1
    local objdir="$BUILD/obj${ndims}${SUFFIX}"
    local flags="$BASEFLAGS"
    if [ "$ndims" = 3 ]; then flags="$flags -DTHREED"; fi

    # 3x3 eigensolver library (3x3-C/Makefile: -O3 -ffast-math)
    for s in dsyevc3 dsyevh3 dsyevq3 dsytrd3 slvsec3; do
        [ -f "$REF/3x3-C/$s.c" ] || continue
        if [ ! -f "$objdir/$s.o" ] || [ "$REF/3x3-C/$s.c" -nt "$objdir/$s.o" ]; then
            echo "CC  3x3-C/$s.c"
            $CXX -Wall -O3 -ffast-math -I"$REF/3x3-C" -c "$REF/3x3-C/$s.c" -o "$objdir/$s.o"
        fi
    done

    # Triangle: -O1 only (Makefile:640-645)
    if [ ! -f "$objdir/triangle.o" ]; then
        echo "CC  triangle/triangle.c"
        $CXX $flags -O1 -DTRILIBRARY -DREDUCED -DANSI_DECLARATORS \
            -c "$REF/triangle/triangle.c" -o "$objdir/triangle.o"
    fi

    local meshobjs="$objdir/triangle.o"
    if [ "$ndims" = 3 ]; then
        # TetGen: predicates at -O0 (Makefile:647-651)
        if [ ! -f "$objdir/predicates.o" ]; then
            echo "CC  tetgen/predicates.cxx"
            $CXX $flags -DTETLIBRARY -O0 -c "$REF/tetgen/predicates.cxx" -o "$objdir/predicates.o"
        fi
        if [ ! -f "$objdir/tetgen.o" ]; then
            echo "CC  tetgen/tetgen.cxx"
            $CXX $flags -DNDEBUG -DTETLIBRARY \
                -Wno-unused-but-set-variable -Wno-int-to-pointer-cast \
                -c "$REF/tetgen/tetgen.cxx" -o "$objdir/tetgen.o"
        fi
        meshobjs="$meshobjs $objdir/predicates.o $objdir/tetgen.o"
    fi

    local objs="$meshobjs"
    for s in $SRCS; do
        local obj="$objdir/$s.o"
        if [ ! -f "$obj" ] || [ "$REF/$s.cxx" -nt "$obj" ] \
           || [ "$SHIM/boost/program_options.hpp" -nt "$obj" ] \
           || [ "$SHIM/nanoflann.hpp" -nt "$obj" ]; then
            echo "CXX $s.cxx (${ndims}D)"
            $CXX $flags -I"$REF/3x3-C" -I"$REF/gospl_driver" \
                -c "$REF/$s.cxx" -o "$obj"
        fi
        objs="$objs $obj"
    done
    for s in dsyevc3 dsyevh3 dsyevq3 dsytrd3 slvsec3; do
        [ -f "$objdir/$s.o" ] && objs="$objs $objdir/$s.o"
    done

    echo "LD  dynearthsol${ndims}d${SUFFIX}"
    $CXX $objs $LDFLAGS -o "$BUILD/dynearthsol${ndims}d${SUFFIX}"
}

dims="${1:-both}"
case "$dims" in
    2) build_dim 2 ;;
    3) build_dim 3 ;;
    *) build_dim 2; build_dim 3 ;;
esac
echo "done: $BUILD"
