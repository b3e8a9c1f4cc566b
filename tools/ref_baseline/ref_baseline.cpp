// Baseline harness: measures the REFERENCE renderer's throughput on the same
// Cornell-box configuration that our bench.py renders, so BASELINE.md has a
// concrete reference number to beat (the reference repo publishes none — see
// BASELINE.md).  This file is OUR code; it only *links* the reference library
// through its public RAYLIB_API surface (`Core/Scene/Scene.h`,
// `Core/Rendering/Viewport.h`, `Core/Rendering/Renderer.h:73`).
// Build instructions + required reference-tree portability patches:
// tools/ref_baseline/README.md.
//
// Scene parity with raytracer_tpu.scene.presets.cornell_box():
//   5 diffuse rect walls (white/red/green), 2 white boxes, 0.5x0.5 ceiling
//   area light (L=18), camera at (0, 1, -3.6) looking +Z, fov 35 deg,
//   "Path Tracer MIS", maxRayDepth=6.
//
// Usage: ref_baseline [size] [passes] [renderer]
//   run with CWD inside the reference tree (e.g. <ref>/Bin) so the blue-noise
//   table at ../Data/BlueNoise128_RGBA16.dat resolves (GenericSampler.cpp:13).

#include <limits>
#include <chrono>
#include <cstdlib>
#include <cstdio>
#include <memory>

#include "Scene/Scene.h"
#include "Scene/Camera.h"
#include "Scene/Light/AreaLight.h"
#include "Scene/Object/SceneObject_Shape.h"
#include "Scene/Object/SceneObject_Light.h"
#include "Shapes/RectShape.h"
#include "Shapes/BoxShape.h"
#include "Math/Quaternion.h"
#include "Material/Material.h"
#include "Rendering/Renderer.h"
#include "Rendering/Viewport.h"
#include "Rendering/Context.h"
#include "Math/Transform.h"

using namespace rt;
using namespace rt::math;

static MaterialPtr MakeDiffuse(const char* name, float r, float g, float b)
{
    auto m = Material::Create();
    m->debugName = name;
    m->SetBsdf("diffuse");
    m->baseColor = Vector4(r, g, b, 0.0f);
    m->Compile();
    return m;
}

// RectShape lies in the local XY plane with +Z normal; rotate it so the
// normal faces the box interior (mirrors presets.cornell_box()).
static void AddRect(Scene& scene, const MaterialPtr& mat, const Vector4& pos,
                    float pitchDeg, float yawDeg, float halfX, float halfY)
{
    ShapePtr shape = std::make_shared<RectShape>(Float2(2.0f * halfX, 2.0f * halfY));
    auto obj = std::make_unique<ShapeSceneObject>(shape);
    obj->SetDefaultMaterial(mat);
    const Quaternion q = Quaternion::FromEulerAngles(
        Float3(pitchDeg * RT_PI / 180.0f, yawDeg * RT_PI / 180.0f, 0.0f));
    obj->SetTransform(Transform(pos, q).ToMatrix4());
    scene.AddObject(std::move(obj));
}

static void AddBox(Scene& scene, const MaterialPtr& mat, const Vector4& pos,
                   float yawDeg, const Vector4& halfSize)
{
    ShapePtr shape = std::make_shared<BoxShape>(halfSize);
    auto obj = std::make_unique<ShapeSceneObject>(shape);
    obj->SetDefaultMaterial(mat);
    const Quaternion q = Quaternion::FromEulerAngles(
        Float3(0.0f, yawDeg * RT_PI / 180.0f, 0.0f));
    obj->SetTransform(Transform(pos, q).ToMatrix4());
    scene.AddObject(std::move(obj));
}

int main(int argc, char** argv)
{
    Scene scene;
    const MaterialPtr white = MakeDiffuse("white", 0.73f, 0.73f, 0.73f);
    const MaterialPtr red = MakeDiffuse("red", 0.63f, 0.065f, 0.05f);
    const MaterialPtr green = MakeDiffuse("green", 0.14f, 0.45f, 0.09f);

    const float hs = 1.0f;  // half-size of the box interior
    AddRect(scene, white, Vector4(0.0f, 0.0f, 0.0f, 0.0f), -90.0f, 0.0f, hs, hs);   // floor
    AddRect(scene, white, Vector4(0.0f, 2 * hs, 0.0f, 0.0f), 90.0f, 0.0f, hs, hs);  // ceiling
    AddRect(scene, white, Vector4(0.0f, hs, hs, 0.0f), 180.0f, 0.0f, hs, hs);       // back
    AddRect(scene, red, Vector4(-hs, hs, 0.0f, 0.0f), 0.0f, 90.0f, hs, hs);         // left
    AddRect(scene, green, Vector4(hs, hs, 0.0f, 0.0f), 0.0f, -90.0f, hs, hs);       // right
    AddBox(scene, white, Vector4(-0.35f, 0.6f, 0.35f, 0.0f), 20.0f, Vector4(0.3f, 0.6f, 0.3f, 0.0f));
    AddBox(scene, white, Vector4(0.4f, 0.3f, -0.25f, 0.0f), -18.0f, Vector4(0.3f, 0.3f, 0.3f, 0.0f));

    {   // ceiling area light
        ShapePtr lshape = std::make_shared<RectShape>(Float2(0.5f, 0.5f));
        auto light = std::make_unique<AreaLight>(lshape, Vector4(18.0f, 18.0f, 18.0f, 0.0f));
        auto lobj = std::make_unique<LightSceneObject>(std::move(light));
        const Quaternion q = Quaternion::FromEulerAngles(Float3(90.0f * RT_PI / 180.0f, 0.0f, 0.0f));
        lobj->SetTransform(Transform(Vector4(0.0f, 2.0f * hs - 1e-3f, 0.0f, 0.0f), q).ToMatrix4());
        scene.AddObject(std::move(lobj));
    }

    if (!scene.BuildBVH())
    {
        fprintf(stderr, "BuildBVH failed\n");
        return 1;
    }

    Viewport viewport;
    const unsigned size = argc > 1 ? (unsigned)atoi(argv[1]) : 512;
    const unsigned passes = argc > 2 ? (unsigned)atoi(argv[2]) : 8;
    const char* rendererName = argc > 3 ? argv[3] : "Path Tracer MIS";
    viewport.Resize(size, size);

    Camera camera;
    camera.SetPerspective(1.0f, 35.0f * RT_PI / 180.0f);
    camera.SetTransform(Transform(Vector4(0.0f, 1.0f, -3.6f, 0.0f), Quaternion::Identity()));

    RenderingParams params;
    params.maxRayDepth = 6;
    params.numThreads = 0;  // all cores
    params.samplingParams.useBlueNoiseDithering = false;
    params.adaptiveSettings.enable = false;
    viewport.SetRenderingParams(params);

    RendererPtr renderer = CreateRenderer(rendererName, scene);
    viewport.SetRenderer(renderer);
    viewport.Reset();

    // warmup (thread pool spin-up, caches)
    viewport.Render(camera);
    viewport.Reset();

    unsigned long long totalRays = 0;
    const auto t0 = std::chrono::steady_clock::now();
    for (unsigned i = 0; i < passes; ++i)
    {
        viewport.Render(camera);
        const RayTracingCounters& c = viewport.GetCounters();
        totalRays += c.numRays + c.numShadowRays;
    }
    const auto t1 = std::chrono::steady_clock::now();
    const double dt = std::chrono::duration<double>(t1 - t0).count();
    printf("{\"renderer\": \"%s\", \"size\": %u, \"passes\": %u, "
           "\"total_rays\": %llu, \"seconds\": %.4f, \"mrays_per_sec\": %.3f}\n",
           rendererName, size, passes, totalRays, dt, totalRays / dt / 1.0e6);
    return 0;
}
