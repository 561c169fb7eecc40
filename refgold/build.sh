#!/bin/sh
# Builds the MobileRT reference engine headlessly against the original
# shim headers in refgold/shims (glm subset, tinyobjloader-compatible
# parser, stb_image-compatible PNG decoder, boost assert/sort) and the
# golden-image driver (refgold/driver.cpp).
#
# Output: refgold/build/refdriver
set -e
cd "$(dirname "$0")"
mkdir -p build
REF=/root/reference/app
SRCS="
$REF/MobileRT/Camera.cpp
$REF/MobileRT/CameraLoader.cpp
$REF/MobileRT/Config.cpp
$REF/MobileRT/Intersection.cpp
$REF/MobileRT/Light.cpp
$REF/MobileRT/Material.cpp
$REF/MobileRT/ObjectLoader.cpp
$REF/MobileRT/Ray.cpp
$REF/MobileRT/Renderer.cpp
$REF/MobileRT/Sampler.cpp
$REF/MobileRT/Scene.cpp
$REF/MobileRT/Shader.cpp
$REF/MobileRT/Texture.cpp
$REF/MobileRT/Shapes/Plane.cpp
$REF/MobileRT/Shapes/Sphere.cpp
$REF/MobileRT/Shapes/Triangle.cpp
$REF/MobileRT/Accelerators/AABB.cpp
$REF/MobileRT/Accelerators/BVH.cpp
$REF/MobileRT/Utils/Utils.cpp
$REF/MobileRT/Utils/ErrorCode.cpp
$REF/MobileRT/Utils/Constants.cpp
$REF/Components/Cameras/Perspective.cpp
$REF/Components/Cameras/Orthographic.cpp
$REF/Components/Lights/PointLight.cpp
$REF/Components/Lights/AreaLight.cpp
$REF/Components/Loaders/OBJLoader.cpp
$REF/Components/Loaders/CameraFactory.cpp
$REF/Components/Loaders/PerspectiveLoader.cpp
$REF/Components/Samplers/Constant.cpp
$REF/Components/Samplers/HaltonSeq.cpp
$REF/Components/Samplers/MersenneTwister.cpp
$REF/Components/Samplers/StaticHaltonSeq.cpp
$REF/Components/Samplers/StaticMersenneTwister.cpp
$REF/Components/Samplers/Stratified.cpp
$REF/Components/Shaders/DepthMap.cpp
$REF/Components/Shaders/DiffuseMaterial.cpp
$REF/Components/Shaders/NoShadows.cpp
$REF/Components/Shaders/PathTracer.cpp
$REF/Components/Shaders/Whitted.cpp
$REF/Scenes/Scenes.cpp
$REF/System_dependent/Native/C_wrapper.cpp
$REF/System_dependent/Native/Utils_dependent.cpp
driver.cpp
"
# PCG samplers need pcg-cpp (not vendored); exclude by compiling without
# them and stubbing nothing: C_wrapper only instantiates StaticHaltonSeq /
# Constant / StaticMersenneTwister / HaltonSeq / MersenneTwister / Stratified.
g++ -O3 -std=c++11 -w -DNDEBUG \
  -I"$REF" -I"$REF/System_dependent/Native" -Ishims \
  $SRCS -o build/refdriver -lpthread -lz
echo "built refgold/build/refdriver"

# Finite-difference gradient driver (no C_wrapper: builds cornellBox2
# itself so one material channel can be perturbed before rendering).
GRADSRCS=$(echo "$SRCS" | grep -v driver.cpp | grep -v C_wrapper.cpp)
g++ -O3 -std=c++11 -w -DNDEBUG \
  -I"$REF" -I"$REF/System_dependent/Native" -Ishims \
  $GRADSRCS graddriver.cpp -o build/graddriver -lpthread -lz
echo "built refgold/build/graddriver"
