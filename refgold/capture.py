#!/usr/bin/env python
"""Captures golden images + measured baseline numbers from the reference
MobileRT engine (built headlessly by refgold/build.sh).

Writes refgold/golden/<name>.bin (int32 w, int32 h, ABGR int32[w*h]) and
refgold/golden/manifest.json with per-config metadata incl. the reference's
own "Total Millions rays per second" metric (C_wrapper.cpp:256).

Determinism notes (what can be compared exactly vs statistically):
- spp<=1 selects the Constant(0.5) pixel sampler (C_wrapper.cpp:144-148), so
  scenes with only PointLights render deterministically for shaders
  NoShadows/Whitted/DepthMap/DiffuseMaterial.
- Scenes with AreaLights (cornell2, CornellBox-Water) draw light-surface
  points from the shared Halton/MT arrays -> only DepthMap/DiffuseMaterial
  are deterministic there; Whitted/PathTracer goldens are statistical.
"""
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
DRIVER = os.path.join(HERE, "build", "refdriver")
OUT = os.path.join(HERE, "golden")
REF_RES = "/root/reference/app/src/androidTest/resources"
CB = os.path.join(REF_RES, "CornellBox", "CornellBox-Water")
TP = os.path.join(REF_RES, "teapot", "teapot")

NPROC = os.cpu_count() or 1

# name, threads, shader, scene, spp, spl, w, h, acc, rep, obj, mtl, cam, kind
# kind: exact = deterministic golden; stat = statistical compare; perf = timing
CONFIGS = [
    # --- deterministic goldens: analytic scenes, point lights only ---
    ("cornell_noshadows_256",  1, 0, 0, 1, 1, 256, 256, 3, 1, "", "", "", "exact"),
    ("cornell_whitted_256",    1, 1, 0, 1, 1, 256, 256, 3, 1, "", "", "", "exact"),
    ("cornell_depthmap_256",   1, 3, 0, 1, 1, 256, 256, 3, 1, "", "", "", "exact"),
    ("cornell_diffuse_256",    1, 4, 0, 1, 1, 256, 256, 3, 1, "", "", "", "exact"),
    ("spheres_whitted_256",    1, 1, 1, 1, 1, 256, 256, 3, 1, "", "", "", "exact"),
    ("spheres2_whitted_256",   1, 1, 3, 1, 1, 256, 256, 3, 1, "", "", "", "exact"),
    # cornell2 has AreaLights: DepthMap/Diffuse stay deterministic
    ("cornell2_depthmap_256",  1, 3, 2, 1, 1, 256, 256, 3, 1, "", "", "", "exact"),
    ("cornell2_diffuse_256",   1, 4, 2, 1, 1, 256, 256, 3, 1, "", "", "", "exact"),
    # --- statistical goldens (RNG-dependent) ---
    ("cornell2_whitted_256_16spp", NPROC, 1, 2, 16, 1, 256, 256, 3, 1, "", "", "", "stat"),
    ("cornell2_pt_256_64spp",  NPROC, 2, 2, 64, 1, 256, 256, 3, 1, "", "", "", "stat"),
    # --- OBJ loader parity: deterministic shaders on loaded scenes ---
    ("water_depthmap_128",     1, 3, 4, 1, 1, 128, 128, 3, 1,
     CB + ".obj", CB + ".mtl", CB + ".cam", "exact"),
    ("water_diffuse_128",      1, 4, 4, 1, 1, 128, 128, 3, 1,
     CB + ".obj", CB + ".mtl", CB + ".cam", "exact"),
    ("teapot_depthmap_128",    1, 3, 4, 1, 1, 128, 128, 3, 1,
     TP + ".obj", TP + ".mtl", TP + ".cam", "exact"),
    ("teapot_diffuse_128",     1, 4, 4, 1, 1, 128, 128, 3, 1,
     TP + ".obj", TP + ".mtl", TP + ".cam", "exact"),
    # teapot.mtl has an emissive "light" material -> AreaLights -> Whitted
    # samples light-surface points from the shared RNG arrays: statistical.
    ("teapot_whitted_128_16spp", NPROC, 1, 4, 16, 1, 128, 128, 3, 1,
     TP + ".obj", TP + ".mtl", TP + ".cam", "stat"),
    # water Whitted (AreaLights -> statistical)
    ("water_whitted_128_16spp", NPROC, 1, 4, 16, 4, 128, 128, 3, 1,
     CB + ".obj", CB + ".mtl", CB + ".cam", "stat"),
    # --- engine-test matrix: 30x30 water, every shader x accelerator ---
] + [
    (f"water30_s{sh}_a{acc}", NPROC, sh, 4, 1, 1, 32, 32, acc, 1,
     CB + ".obj", CB + ".mtl", CB + ".cam", "smoke")
    for sh in range(5) for acc in (1, 2, 3)
] + [
    # --- perf baselines (reference rays/s on this host's CPU) ---
    ("perf_cornell2_pt_512_8spp", NPROC, 2, 2, 8, 1, 512, 512, 3, 1,
     "", "", "", "perf"),
    ("perf_water_whitted_512",  NPROC, 1, 4, 1, 1, 512, 512, 3, 1,
     CB + ".obj", CB + ".mtl", CB + ".cam", "perf"),
    ("perf_cornell_whitted_512", NPROC, 1, 0, 1, 1, 512, 512, 3, 1,
     "", "", "", "perf"),
]

RAYS_RE = re.compile(r"Casted rays = (\d+)")
MRPS_RE = re.compile(r"Total Millions rays per second = ([0-9.eE+-]+)")
RENDER_RE = re.compile(r"Rendering Time in secs = ([0-9.eE+-]+)")


def main():
    os.makedirs(OUT, exist_ok=True)
    # Merge into any existing manifest so filtered re-captures don't drop
    # the other entries.
    mpath = os.path.join(OUT, "manifest.json")
    manifest = {}
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for cfg in CONFIGS:
        (name, threads, shader, scene, spp, spl, w, h, acc, rep,
         obj, mtl, cam, kind) = cfg
        if only and only not in name:
            continue
        out_bin = os.path.join(OUT, name + ".bin")
        argv = [DRIVER, str(threads), str(shader), str(scene), str(spp),
                str(spl), str(w), str(h), str(acc), str(rep),
                obj, mtl, cam, out_bin]
        print(f"[capture] {name} ...", flush=True)
        try:
            proc = subprocess.run(argv, capture_output=True, text=True,
                                  timeout=1800)
        except subprocess.TimeoutExpired:
            manifest[name] = {"error": "timeout"}
            continue
        text = proc.stdout + proc.stderr
        rays = RAYS_RE.search(text)
        mrps = MRPS_RE.search(text)
        rsecs = RENDER_RE.search(text)
        manifest[name] = {
            "kind": kind,
            "rc": proc.returncode,
            "threads": threads, "shader": shader, "scene": scene,
            "spp": spp, "spl": spl, "width": w, "height": h,
            "accelerator": acc,
            "obj": os.path.basename(obj) if obj else "",
            "casted_rays": int(rays.group(1)) if rays else None,
            "mrays_per_sec": float(mrps.group(1)) if mrps else None,
            "render_secs": float(rsecs.group(1)) if rsecs else None,
        }
        if proc.returncode != 0:
            manifest[name]["stderr_tail"] = proc.stderr[-500:]
        print(f"  rc={proc.returncode} rays={manifest[name]['casted_rays']} "
              f"Mrays/s={manifest[name]['mrays_per_sec']}", flush=True)
    with open(os.path.join(OUT, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"wrote {len(manifest)} entries to golden/manifest.json")


if __name__ == "__main__":
    main()
