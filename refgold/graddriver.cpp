// Headless finite-difference gradient driver for the MobileRT reference.
//
// Renders the hardcoded cornellBox2 scene with ONE scalar perturbed by
// DELTA, so the framework's reverse-mode gradients can be validated
// against central differences of the *actual reference binary*
// (BASELINE.md config #4).  The scene/shader/renderer pipeline mirrors the
// reference's own driver (app/System_dependent/Native/C_wrapper.cpp:68-220)
// with the single addition of the perturbation after scene construction.
//
// Usage:
//   graddriver THREADS SHADER SPP SPL WIDTH HEIGHT ACC MODE IDX CH DELTA OUT.bin
// MODE "m": IDX = material index, CH in 0..2 = Kd channel.
// MODE "v": IDX = triangle index into scene.triangles_, CH in 0..8 =
//   3*vertex + coordinate (vertex 0 = A, 1 = B = A+AB, 2 = C = A+AC); the
//   triangle is REBUILT through Triangle::Builder with the perturbed
//   point, so its stored normal is recomputed exactly as an originally-
//   perturbed scene would have it (Triangle.cpp:336 normalA = norm(ACxAB)).
// Output file: int32 width, int32 height, int32 bitmap[w*h] (packed ABGR).
// Stdout: "GRAD mats=<n> baseKd=..." or "GRAD tris=<n> baseV=..." for
// index-mapping checks.
#include "MobileRT/Renderer.hpp"
#include "MobileRT/Scene.hpp"
#include "MobileRT/Utils/Constants.hpp"
#include "MobileRT/Utils/Utils.hpp"
#include "Components/Cameras/Perspective.hpp"
#include "Components/Samplers/Constant.hpp"
#include "Components/Samplers/StaticHaltonSeq.hpp"
#include "Components/Shaders/PathTracer.hpp"
#include "Components/Shaders/Whitted.hpp"
#include "Scenes/Scenes.hpp"

#include <cstdio>
#include <cstdlib>
#include <vector>

int main(int argc, char **argv) {
    if (argc != 13) {
        std::fprintf(stderr,
                     "usage: %s THREADS SHADER SPP SPL WIDTH HEIGHT ACC "
                     "MODE IDX CH DELTA OUT.bin\n", argv[0]);
        return 1;
    }
    const std::int32_t threads {(std::int32_t)strtol(argv[1], nullptr, 0)};
    const std::int32_t shader {(std::int32_t)strtol(argv[2], nullptr, 0)};
    const std::int32_t spp {(std::int32_t)strtol(argv[3], nullptr, 0)};
    const std::int32_t spl {(std::int32_t)strtol(argv[4], nullptr, 0)};
    const std::int32_t tile {(std::int32_t)std::sqrt(MobileRT::NumberOfTiles)};
    const std::int32_t width {MobileRT::roundDownToMultipleOf(
        (std::int32_t)strtol(argv[5], nullptr, 0), tile)};
    const std::int32_t height {MobileRT::roundDownToMultipleOf(
        (std::int32_t)strtol(argv[6], nullptr, 0), tile)};
    const std::int32_t acc {(std::int32_t)strtol(argv[7], nullptr, 0)};
    const char mode {argv[8][0]};
    const std::int32_t idx {(std::int32_t)strtol(argv[9], nullptr, 0)};
    const std::int32_t ch {(std::int32_t)strtol(argv[10], nullptr, 0)};
    const float delta {(float)strtod(argv[11], nullptr)};
    const std::string outPath {argv[12]};

    const float ratio {(float)width / (float)height};
    ::MobileRT::Scene scene {};
    scene = cornellBox2_Scene(::std::move(scene));
    if (mode == 'm') {
        if (idx < 0 || idx >= (std::int32_t)scene.materials_.size()
            || ch < 0 || ch > 2) {
            std::fprintf(stderr, "bad material index/channel\n");
            return 1;
        }
        const ::glm::vec3 baseKd {scene.materials_[(size_t)idx].Kd_};
        scene.materials_[(size_t)idx].Kd_[ch] += delta;
        std::printf("GRAD mats=%zu baseKd=%g,%g,%g\n",
                    scene.materials_.size(), (double)baseKd[0],
                    (double)baseKd[1], (double)baseKd[2]);
    } else if (mode == 'v') {
        if (idx < 0 || idx >= (std::int32_t)scene.triangles_.size()
            || ch < 0 || ch > 8) {
            std::fprintf(stderr, "bad triangle index/coord\n");
            return 1;
        }
        const ::MobileRT::Triangle &tri {scene.triangles_[(size_t)idx]};
        ::glm::vec3 pts[3] {tri.getA(), tri.getA() + tri.getAB(),
                            tri.getA() + tri.getAC()};
        std::printf("GRAD tris=%zu baseV=%g,%g,%g\n",
                    scene.triangles_.size(), (double)pts[ch / 3][0],
                    (double)pts[ch / 3][1], (double)pts[ch / 3][2]);
        pts[ch / 3][ch % 3] += delta;
        scene.triangles_[(size_t)idx] = ::MobileRT::Triangle::Builder(
            pts[0], pts[1], pts[2])
            .withMaterialIndex(tri.getMaterialIndex())
            .build();
    } else {
        std::fprintf(stderr, "bad mode %c\n", mode);
        return 1;
    }

    auto camera = cornellBox_Cam(ratio);
    ::std::unique_ptr<::MobileRT::Sampler> samplerPixel {};
    if (spp > 1) {
        samplerPixel =
            ::MobileRT::std::make_unique<::Components::StaticHaltonSeq>();
    } else {
        samplerPixel =
            ::MobileRT::std::make_unique<::Components::Constant>(0.5F);
    }
    ::std::unique_ptr<::MobileRT::Shader> shader_ {};
    if (shader == 2) {
        ::std::unique_ptr<MobileRT::Sampler> rr {
            ::MobileRT::std::make_unique<::Components::StaticHaltonSeq>()};
        shader_ = ::MobileRT::std::make_unique<::Components::PathTracer>(
            ::std::move(scene), ::std::move(rr), spl,
            ::MobileRT::Shader::Accelerator(acc));
    } else {
        shader_ = ::MobileRT::std::make_unique<::Components::Whitted>(
            ::std::move(scene), spl, ::MobileRT::Shader::Accelerator(acc));
    }
    auto renderer = ::MobileRT::std::make_unique<::MobileRT::Renderer>(
        ::std::move(shader_), ::std::move(camera), ::std::move(samplerPixel),
        width, height, spp);
    std::vector<std::int32_t> bitmap((size_t)width * (size_t)height, 0);
    renderer->renderFrame(bitmap.data(), threads);

    std::FILE *f {std::fopen(outPath.c_str(), "wb")};
    if (f == nullptr) {
        std::fprintf(stderr, "cannot open %s\n", outPath.c_str());
        return 1;
    }
    std::fwrite(&width, sizeof width, 1, f);
    std::fwrite(&height, sizeof height, 1, f);
    std::fwrite(bitmap.data(), sizeof(std::int32_t), bitmap.size(), f);
    std::fclose(f);
    return 0;
}
