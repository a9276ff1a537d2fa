#!/bin/bash
# Round-5 hardware measurement sequence — runs once the TPU tunnel is
# back.  Each leg logs to /tmp and is independently timeout-guarded so
# one wedge cannot eat the session.
cd /root/repo
set -x

# 1. Mesh leg-order A/B at the r04 config (TB=128) — VERDICT r4 #1.
RTOW_TRI_BLOCK=128 PYTHONUNBUFFERED=1 timeout 2400 \
  python tools/mesh_ab.py > /tmp/mesh_ab.log 2>&1
echo "mesh_ab rc=$?"

# 2. TRI_BLOCK auto-pick confirm: 65k at the per-scene 256 pick vs the
#    128 control, same session (tools/mesh_roofline.py step 1 only is
#    overkill; reuse mesh_ab's phase-A timing via env).
PYTHONUNBUFFERED=1 timeout 2400 python - > /tmp/tb256_confirm.log 2>&1 <<'PY'
import sys, time, statistics, jax
sys.path.insert(0, "tools"); sys.path.insert(0, ".")
from make_mesh import make_knot
from rtow_tpu.config import Config
from rtow_tpu.models.camera import make_camera
from rtow_tpu.models.scene import SceneBuilder
from rtow_tpu.ops.wavefront_sorted import render_wavefront
from rtow_tpu.ops import pallas_megakernel as mk

cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                  fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                  focus_dist=3.0)
cfg = Config(image_width=400, aspect_ratio=1.0, samples_per_pixel=64,
             max_child_rays=20)
verts, faces = make_knot(256, 128)
b = SceneBuilder()
b.add_mesh(verts[faces], b.add_lambertian((0.6, 0.5, 0.4)))
knot = b.build()

def med5(tb):
    mk._TRI_BLOCK_FORCED = tb  # pin; 0 = auto-pick (256 for 65k)
    render_wavefront(knot, cam, cfg)  # compile
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(render_wavefront(knot, cam, cfg))
        ts.append(400*400*64/(time.perf_counter()-t0)/1e6)
        print(f"TB={tb or 'auto'} run {i+1}/5: {ts[-1]:.2f} Mrays/s",
              flush=True)
    return statistics.median(ts)

m128 = med5(128)
mauto = med5(0)   # auto -> 256 at 65k
m128b = med5(128) # drift control
print(f"RESULT 65k TB128 {m128:.2f} | auto(256) {mauto:.2f} | "
      f"TB128-again {m128b:.2f}  (target >= 6.0 at auto)")
PY
echo "tb256 rc=$?"

# 3. Gradient roofline: unsorted vs sorted on hardware.
RTOW_GRAD_SORT=0 PYTHONUNBUFFERED=1 timeout 3600 \
  python tools/grad_roofline.py > /tmp/grad_roofline_unsorted.log 2>&1
echo "grad unsorted rc=$?"
PYTHONUNBUFFERED=1 timeout 3600 \
  python tools/grad_roofline.py --sorted > /tmp/grad_roofline_sorted.log 2>&1
echo "grad sorted rc=$?"

# 4. Pool emergency handout A/B at the north-star config.
PYTHONUNBUFFERED=1 timeout 3600 python - > /tmp/pool_emergency.log 2>&1 <<'PY'
import os, time, statistics, sys
import jax
from rtow_tpu.config import Config
from rtow_tpu.models.builders import cover_scene

cfg = Config(image_width=1200, aspect_ratio=16.0/9.0,
             samples_per_pixel=500, max_child_rays=50)
scene, cam = cover_scene(cfg)
lanes = cfg.image_width * cfg.image_height * 500

def run(tag):
    # fresh trace per env setting (pool knobs are part of the jit key)
    from rtow_tpu.pipeline import render_pallas
    render_pallas(scene, cam, cfg)  # compile
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        render_pallas(scene, cam, cfg)
        ts.append(lanes/(time.perf_counter()-t0)/1e6)
        print(f"{tag} run {i+1}/3: {ts[-1]:.2f} Mrays/s", flush=True)
    return statistics.median(ts)

os.environ["RTOW_POOL_EMERGENCY"] = "0"
base = run("emergency=0")
os.environ["RTOW_POOL_EMERGENCY"] = "1"
emer = run("emergency=1")
os.environ["RTOW_POOL_EMERGENCY"] = "0"
base2 = run("emergency=0 again")
print(f"RESULT spp500 base {base:.2f} | emergency {emer:.2f} | "
      f"base-again {base2:.2f}")
PY
echo "pool rc=$?"

# 5. The full bench (the driver's command) for the round numbers.
PYTHONUNBUFFERED=1 timeout 4800 python bench.py > /tmp/bench_r5.log 2>&1
echo "bench rc=$?"
tail -1 /tmp/bench_r5.log

# 6. PARITY refresh (golden block-mean parity vs the C++ oracle at the
#    north-star config) — the round-end routine.
PYTHONUNBUFFERED=1 timeout 4800 python tools/golden_compare.py \
  > /tmp/parity_r5.log 2>&1
echo "parity rc=$?"
tail -2 /tmp/parity_r5.log
