// Headless finite-difference gradient driver for the MobileRT reference.
//
// Renders the hardcoded cornellBox2 scene with ONE material channel
// perturbed by DELTA, so the framework's reverse-mode d(loss)/d(kd) can be
// validated against central differences of the *actual reference binary*
// (BASELINE.md config #4).  The scene/shader/renderer pipeline mirrors the
// reference's own driver (app/System_dependent/Native/C_wrapper.cpp:68-220)
// with the single addition of the perturbation after scene construction.
//
// Usage:
//   graddriver THREADS SHADER SPP SPL WIDTH HEIGHT ACC MATIDX CH DELTA OUT.bin
// Output file: int32 width, int32 height, int32 bitmap[w*h] (packed ABGR).
// Stdout: "GRAD mats=<n> baseKd=<r>,<g>,<b>" for index-mapping checks.
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
    if (argc != 12) {
        std::fprintf(stderr,
                     "usage: %s THREADS SHADER SPP SPL WIDTH HEIGHT ACC "
                     "MATIDX CH DELTA OUT.bin\n", argv[0]);
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
    const std::int32_t matIdx {(std::int32_t)strtol(argv[8], nullptr, 0)};
    const std::int32_t ch {(std::int32_t)strtol(argv[9], nullptr, 0)};
    const float delta {(float)strtod(argv[10], nullptr)};
    const std::string outPath {argv[11]};

    const float ratio {(float)width / (float)height};
    ::MobileRT::Scene scene {};
    scene = cornellBox2_Scene(::std::move(scene));
    if (matIdx < 0 ||
        matIdx >= (std::int32_t)scene.materials_.size() || ch < 0 || ch > 2) {
        std::fprintf(stderr, "bad material index/channel\n");
        return 1;
    }
    const ::glm::vec3 baseKd {scene.materials_[(size_t)matIdx].Kd_};
    scene.materials_[(size_t)matIdx].Kd_[ch] += delta;
    std::printf("GRAD mats=%zu baseKd=%g,%g,%g\n", scene.materials_.size(),
                (double)baseKd[0], (double)baseKd[1], (double)baseKd[2]);

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
