// Headless golden-image driver for the MobileRT reference engine.
//
// Mirrors the Qt CLI's 16-argument contract
// (reference app/System_dependent/Native/Qt/MobileRT/main.cpp:9-63) but
// instead of displaying the bitmap, dumps it to a raw little-endian file:
//   int32 width, int32 height, int32 bitmap[width*height]  (packed ABGR)
// and prints a "GOLDEN rays=<n> renderSecs=<s>" line for the harness.
//
// Usage:
//   refdriver THREADS SHADER SCENE SPP SPL WIDTH HEIGHT ACC REP \
//             OBJ MTL CAM OUTPUT.bin
#include "MobileRT/Config.hpp"
#include "MobileRT/Utils/Constants.hpp"
#include "MobileRT/Utils/Utils.hpp"
#include "System_dependent/Native/C_wrapper.h"

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <string>

int main(int argc, char **argv) {
    if (argc != 14) {
        std::fprintf(stderr,
                     "usage: %s THREADS SHADER SCENE SPP SPL WIDTH HEIGHT "
                     "ACC REP OBJ MTL CAM OUTPUT.bin\n",
                     argv[0]);
        return 1;
    }
    const std::int32_t threads {(std::int32_t)strtol(argv[1], nullptr, 0)};
    const std::int32_t shader {(std::int32_t)strtol(argv[2], nullptr, 0)};
    const std::int32_t scene {(std::int32_t)strtol(argv[3], nullptr, 0)};
    const std::int32_t spp {(std::int32_t)strtol(argv[4], nullptr, 0)};
    const std::int32_t spl {(std::int32_t)strtol(argv[5], nullptr, 0)};
    const std::int32_t tile {(std::int32_t)std::sqrt(MobileRT::NumberOfTiles)};
    const std::int32_t width {MobileRT::roundDownToMultipleOf(
        (std::int32_t)strtol(argv[6], nullptr, 0), tile)};
    const std::int32_t height {MobileRT::roundDownToMultipleOf(
        (std::int32_t)strtol(argv[7], nullptr, 0), tile)};
    const std::int32_t accelerator {(std::int32_t)strtol(argv[8], nullptr, 0)};
    const std::int32_t repeats {(std::int32_t)strtol(argv[9], nullptr, 0)};
    const std::string pathObj {argv[10]};
    const std::string pathMtl {argv[11]};
    const std::string pathCam {argv[12]};
    const std::string outPath {argv[13]};

    MobileRT::Config config {};
    config.width = width;
    config.height = height;
    config.threads = threads;
    config.shader = shader;
    config.sceneIndex = scene;
    config.samplesPixel = spp;
    config.samplesLight = spl;
    config.repeats = repeats;
    config.accelerator = accelerator;
    config.printStdOut = true;
    config.objFilePath = pathObj;
    config.mtlFilePath = pathMtl;
    config.camFilePath = pathCam;
    config.bitmap = std::vector<std::int32_t>(
        (size_t)width * (size_t)height, 0);

    const auto t0 {std::chrono::steady_clock::now()};
    RayTrace(config, false);
    const auto t1 {std::chrono::steady_clock::now()};
    const double secs {
        std::chrono::duration<double>(t1 - t0).count()};

    std::FILE *f {std::fopen(outPath.c_str(), "wb")};
    if (f == nullptr) {
        std::fprintf(stderr, "cannot open %s\n", outPath.c_str());
        return 1;
    }
    std::fwrite(&width, sizeof width, 1, f);
    std::fwrite(&height, sizeof height, 1, f);
    std::fwrite(config.bitmap.data(), sizeof(std::int32_t),
                config.bitmap.size(), f);
    std::fclose(f);
    std::printf("GOLDEN out=%s w=%d h=%d wallSecs=%.3f\n", outPath.c_str(),
                width, height, secs);
    return 0;
}
