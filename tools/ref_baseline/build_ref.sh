#!/bin/bash
# Build the reference renderer (patched for Linux/g++) into /tmp/refpatched.
# Patches are described in README.md; none change rendering behavior except
# the upstream Memory.cpp allocator bug fix (without which the reference
# cannot run on Linux at all).
#
# Products:
#   /tmp/refpatched/          patched source tree
#   /tmp/refpatched/build/    libCore.so (+ Tests binary if BUILD_TESTS=1)
#   /tmp/refpatched/harness/  ref_baseline + dump_goldens binaries
set -euo pipefail

REF=/root/reference
DST=/tmp/refpatched
HARNESS_DIR="$(cd "$(dirname "$0")" && pwd)"

if [ ! -f "$DST/.patched" ]; then
  rm -rf "$DST"
  mkdir -p "$DST"
  cp -r "$REF/Core" "$REF/Demo" "$REF/External" "$REF/Tests" "$DST/"
  mkdir -p "$DST/Data" "$DST/Bin"
  # data files needed at runtime (blue-noise table, scenes, textures)
  cp -r "$REF/Data/." "$DST/Data/" 2>/dev/null || true

  cd "$DST"

  # --- patch 1: VectorInt4 copy ctor must be defaulted for g++ anonymous
  # aggregate rules (used inside VectorInt8's union)
  sed -i 's|RT_FORCE_INLINE VectorInt4(const VectorInt4& other);|VectorInt4(const VectorInt4\& other) = default;|' Core/Math/VectorInt4.h
  # delete the out-of-line definitions (4-line blocks)
  python3 - <<'EOF'
import re
for p in ("Core/Math/VectorInt4ImplNaive.h", "Core/Math/VectorInt4ImplSSE.h"):
    s = open(p).read()
    s = re.sub(r"VectorInt4::VectorInt4\(const VectorInt4& other\)[^}]*}\n", "", s, count=1)
    open(p, "w").write(s)
EOF

  # --- patch 2: gate the non-AVX union member in VectorInt8
  python3 - <<'EOF'
import re
p = "Core/Math/VectorInt8.h"
s = open(p).read()
s = re.sub(r"(\n\s*struct\s*\n\s*\{\s*\n\s*VectorInt4 low;\s*\n\s*VectorInt4 high;\s*\n\s*\};)",
           r"\n#ifndef RT_USE_AVX\1\n#endif // RT_USE_AVX", s, count=1)
assert "#ifndef RT_USE_AVX" in s
open(p, "w").write(s)
EOF

  # --- patch 3: Windows-only includes
  sed -i 's|#include <Windows.h>|#ifdef WIN32\n#include <Windows.h>\n#endif|' Core/Utils/Profiler.h Core/Utils/Memory.cpp
  # Profiler.h uses QueryPerformanceCounter/LARGE_INTEGER directly: POSIX shim
  python3 - <<'EOF'
p = "Core/Utils/Profiler.h"
s = open(p).read()
shim = """#ifndef WIN32
#include <ctime>
#include <cstdint>
typedef union { int64_t QuadPart; } LARGE_INTEGER;
static inline int QueryPerformanceCounter(LARGE_INTEGER* out)
{
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    out->QuadPart = (int64_t)ts.tv_sec * 1000000000ll + ts.tv_nsec;
    return 1;
}
#endif // !WIN32

namespace rt {"""
s = s.replace("namespace rt {", shim, 1)
open(p, "w").write(s)
EOF
  sed -i 's|#include <intrin.h>|#ifdef WIN32\n#include <intrin.h>\n#else\n#include <x86intrin.h>\n#endif|' Core/Utils/MemoryHelpers.cpp
  # POSIX timer period (nanosecond clock_gettime ticks)
  sed -i 's|#endif // WIN32\n\nTimer::Timer()|&|' Core/Utils/Timer.cpp
  python3 - <<'EOF'
p = "Core/Utils/Timer.cpp"
s = open(p).read()
s = s.replace("#endif // WIN32\n\nTimer::Timer()",
              "#else\nconst double gTimerPeriod = 1.0e-9;\n#endif // WIN32\n\nTimer::Timer()")
open(p, "w").write(s)
EOF

  # --- patch 4 (UPSTREAM BUG): SystemAllocator::Allocate drops the pointer
  python3 - <<'EOF'
p = "Core/Utils/Memory.cpp"
s = open(p).read()
assert "    DefaultAllocator::Allocate(size, alignment);" in s
s = s.replace("    DefaultAllocator::Allocate(size, alignment);",
              "    ptr = DefaultAllocator::Allocate(size, alignment);")
open(p, "w").write(s)
EOF

  # --- patch 5: newer libstdc++ needs <limits> in google-benchmark
  sed -i '1i #include <limits>' External/benchmark/src/benchmark_register.h 2>/dev/null || true
  sed -i '1i #include <limits>' External/cxxopts.hpp

  # --- patch 7: MSVC extension in SceneLoader.cpp (default arg binds a
  # temporary to a non-const reference) — use a file-local dummy map instead
  python3 - <<'EOF'
p = "Demo/SceneLoader.cpp"
s = open(p).read()
old = "static ShapePtr ParseShape(const rapidjson::Value& value, Scene& scene, MaterialsMap& materials = MaterialsMap())"
assert old in s
s = s.replace(old,
    "static MaterialsMap gDummyMaterialsMap;\n"
    "static ShapePtr ParseShape(const rapidjson::Value& value, Scene& scene, "
    "MaterialsMap& materials = gDummyMaterialsMap)")
# 'return false;' in a ShapePtr-returning function (MSVC-ism) -> nullptr
i = s.index("ParseShape(const rapidjson::Value& value")
j = s.index("return shape;\n}", i)
s = s[:i] + s[i:j].replace("return false;", "return nullptr;") + s[j:]
open(p, "w").write(s)
EOF

  # --- patch 6: replace Demo/Demo.h with a headless stub (Window.h needs xcb
  # headers absent from this image).  Only SceneLoader/MeshLoader are compiled
  # from Demo/, and they use nothing from Demo.h except Options/gOptions.
  cat > Demo/Demo.h <<'EOF'
#pragma once
// Headless stub replacing the interactive Demo.h (original needs xcb).
#include "../Core/Scene/Scene.h"
#include "../Core/Scene/Camera.h"
#include <string>

struct Options
{
    unsigned windowWidth = 1280;
    unsigned windowHeight = 720;
    std::string dataPath;
    unsigned numThreads = 0;
    bool enablePacketTracing = false;
    std::string rendererName = "Path Tracer";
    std::string sceneName;
};

extern Options gOptions;
EOF

  # --- patch 8: write uncompressed EXR (our io/exr.py reader + goldens)
  sed -i 's/header.compression_type = TINYEXR_COMPRESSIONTYPE_PIZ;/header.compression_type = TINYEXR_COMPRESSIONTYPE_NONE;/' Core/Utils/BitmapEXR.cpp

  # --- shim top-level CMakeLists (Core only; Demo needs X11)
  cat > CMakeLists.txt <<'EOF'
CMAKE_MINIMUM_REQUIRED(VERSION 3.10)
PROJECT(RefPatched CXX)
SET(CMAKE_CXX_STANDARD 14)
SET(RT_OUTPUT_DIRECTORY ${CMAKE_BINARY_DIR})
SET(RT_CORE_DIRECTORY ${CMAKE_SOURCE_DIR}/Core)
SET(CMAKE_RUNTIME_OUTPUT_DIRECTORY ${CMAKE_BINARY_DIR})
SET(CMAKE_LIBRARY_OUTPUT_DIRECTORY ${CMAKE_BINARY_DIR})
ADD_COMPILE_OPTIONS(-O2 -msse -msse2 -msse4.1 -mavx -mavx2 -mfma -fno-fast-math)
ADD_DEFINITIONS(-DRT_USE_SSE -DRT_USE_AVX -DRT_USE_AVX2 -DRT_USE_FMA)
ADD_SUBDIRECTORY(Core)
IF(DEFINED ENV{BUILD_TESTS})
  ADD_SUBDIRECTORY(External/googletest)
  ADD_SUBDIRECTORY(Tests)
ENDIF()
EOF

  touch "$DST/.patched"
fi

cd "$DST"
mkdir -p build && cd build
cmake -G Ninja .. >/dev/null
ninja Core

# --- harness binaries ---------------------------------------------------------
mkdir -p "$DST/harness"
FLAGS="-O2 -std=gnu++14 -msse -msse2 -msse4.1 -mavx -mavx2 -mfma
  -DRT_USE_SSE -DRT_USE_AVX -DRT_USE_AVX2 -DRT_USE_FMA
  -I$DST/Core -I$DST -I$DST/External -L$DST/build -lCore -Wl,-rpath,$DST/build -lpthread"

g++ "$HARNESS_DIR/ref_baseline.cpp" -o "$DST/harness/ref_baseline" $FLAGS

if [ -f "$HARNESS_DIR/dump_goldens.cpp" ]; then
  g++ "$HARNESS_DIR/dump_goldens.cpp" \
      "$DST/Demo/SceneLoader.cpp" "$DST/Demo/MeshLoader.cpp" \
      "$DST/External/tiny_obj_loader.cpp" \
      -I"$DST/Demo" -o "$DST/harness/dump_goldens" $FLAGS
fi

if [ -f "$HARNESS_DIR/bench_scene.cpp" ]; then
  g++ "$HARNESS_DIR/bench_scene.cpp" \
      "$DST/Demo/SceneLoader.cpp" "$DST/Demo/MeshLoader.cpp" \
      "$DST/External/tiny_obj_loader.cpp" \
      -I"$DST/Demo" -o "$DST/harness/bench_scene" $FLAGS
fi

echo "OK: $DST/build/libCore.so + harness binaries"
