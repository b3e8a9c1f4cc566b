// Golden-image dumper: renders a reference TestScene JSON through the
// REFERENCE renderer (linked via its public RAYLIB_API surface, like
// ref_baseline.cpp) and writes the mean-radiance EXR.  These EXRs become the
// committed goldens that tests/test_ref_agreement.py validates our renderer
// against (BASELINE.md "image agreement" metric; the reference's own
// ValidateBitmap pattern, Tests/RaytracingTests.cpp:241-259).
//
// Usage: dump_goldens <scene.json> <out.exr> [size=128] [passes=512]
//                     [renderer="Path Tracer MIS"] [maxDepth=8] [dataPath]
//
// Run with CWD such that <dataPath>/BlueNoise128_RGBA16.dat resolves if blue
// noise is enabled (we disable it for determinism-by-mean anyway).

#include <limits>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <memory>

#include "Scene/Scene.h"
#include "Scene/Camera.h"
#include "Rendering/Renderer.h"
#include "Rendering/Viewport.h"
#include "Rendering/Context.h"
#include "Utils/Bitmap.h"
#include "Demo.h"         // headless stub (build_ref.sh patch 6)
#include "SceneLoader.h"

Options gOptions;  // referenced by SceneLoader/MeshLoader for dataPath

using namespace rt;

int main(int argc, char** argv)
{
    if (argc < 3)
    {
        fprintf(stderr, "usage: dump_goldens <scene.json> <out.exr> [size] "
                        "[passes] [renderer] [maxDepth] [dataPath]\n");
        return 2;
    }
    const std::string scenePath = argv[1];
    const std::string outPath = argv[2];
    const unsigned size = argc > 3 ? (unsigned)atoi(argv[3]) : 128;
    const unsigned passes = argc > 4 ? (unsigned)atoi(argv[4]) : 512;
    const char* rendererName = argc > 5 ? argv[5] : "Path Tracer MIS";
    const unsigned maxDepth = argc > 6 ? (unsigned)atoi(argv[6]) : 8;
    gOptions.dataPath = argc > 7 ? argv[7] : "../Data/";

    Scene scene;
    Camera camera;
    if (!helpers::LoadScene(scenePath, scene, camera))
    {
        fprintf(stderr, "LoadScene failed: %s\n", scenePath.c_str());
        return 1;
    }
    if (!scene.BuildBVH())
    {
        fprintf(stderr, "BuildBVH failed\n");
        return 1;
    }

    Viewport viewport;
    viewport.Resize(size, size);

    RenderingParams params;
    params.maxRayDepth = maxDepth;
    params.numThreads = 0;  // all cores
    params.antiAliasingSpread = 0.5f;
    params.samplingParams.useBlueNoiseDithering = false;
    params.adaptiveSettings.enable = false;
    viewport.SetRenderingParams(params);

    RendererPtr renderer = CreateRenderer(rendererName, scene);
    if (!renderer)
    {
        fprintf(stderr, "unknown renderer: %s\n", rendererName);
        return 1;
    }
    viewport.SetRenderer(renderer);
    viewport.Reset();

    for (unsigned i = 0; i < passes; ++i)
    {
        if (!viewport.Render(camera))
        {
            fprintf(stderr, "Render failed at pass %u\n", i);
            return 1;
        }
    }

    const Bitmap& sum = viewport.GetSumBuffer();
    if (!sum.SaveEXR(outPath.c_str(), 1.0f / (float)passes))
    {
        fprintf(stderr, "SaveEXR failed: %s\n", outPath.c_str());
        return 1;
    }
    printf("{\"scene\": \"%s\", \"out\": \"%s\", \"size\": %u, \"passes\": %u, "
           "\"renderer\": \"%s\", \"maxDepth\": %u}\n",
           scenePath.c_str(), outPath.c_str(), size, passes, rendererName, maxDepth);
    return 0;
}
