"""One-command reference-format pipeline artifact -> REFPIPE.json (VERDICT r2 #7).

Exercises the EXACT path real HM3D data takes into this framework
(/root/reference/preprocess/convert_cubemaps_mp.py -> convert.py:131-181):

  1. generate  procedural RGB-D panorama scenes via the cube-rig path
               (preprocess/generate.py via_cubes=True — the reference's
               Habitat rig analogue)
  2. export    each scene in the reference generator's on-disk layout
               (pano/%05d.png, pano_depth mm PNGs, rotation/translation.npy)
  3. convert   scripts/convert_reference_dataset.py logic over those bytes
               (convert_reference_scene) into the training store
  4. train     N steps of the real CLI (python -m splatter360_tpu.main)
  5. eval      mode=test on the converted store -> scores_all_avg.json

Writes REFPIPE.json with the per-stage artifacts + final metrics. Run under
the CPU env (see .claude/skills/verify):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/pipeline_reference_format.py [workdir]
"""

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, ".")

from splatter360_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()

TINY_MODEL = [
    "model.d_feature=32", "model.num_depth_candidates=16",
    "model.costvolume_unet_feat_dim=32",
    "model.costvolume_unet_channel_mult=[1,1]",
    "model.costvolume_unet_attn_res=[2]", "model.depth_unet_feat_dim=8",
    "model.depth_unet_attn_res=[8]", "model.depth_unet_channel_mult=[1,1,1]",
    "model.gaussian_adapter.sh_degree=1",
]


def main():
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/refpipe")
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    work.mkdir(parents=True, exist_ok=True)
    gen_root = work / "generated"
    raw_root = work / "reference_layout"
    store = work / "converted_store"
    out_dir = work / "run"
    report = {"workdir": str(work)}

    # 1. generate via the cube rig (reference parity path)
    from splatter360_tpu.preprocess import generate_scene

    scenes = {"train": ["ref000", "ref001"], "test": ["ref900"]}
    for split, names in scenes.items():
        for i, name in enumerate(names):
            generate_scene(
                str(gen_root), split, name, n_frames=16,
                image_shape=(64, 128), seed=100 + i + (0 if split == "train" else 50),
                spacing=0.09, via_cubes=True,
            )
    report["generated"] = scenes

    # 2. export in the reference generator's on-disk layout
    from splatter360_tpu.data.scene_io import (
        convert_reference_scene, export_reference_layout, load_scene,
    )

    for split, names in scenes.items():
        for name in names:
            export_reference_layout(
                str(gen_root), split, name, str(raw_root / split / name)
            )
    n_pngs = len(list(raw_root.glob("*/*/pano/*.png")))
    report["reference_layout_pngs"] = n_pngs

    # 3. convert (the convert_reference_dataset.py path)
    for split, names in scenes.items():
        for name in names:
            convert_reference_scene(
                str(raw_root / split / name), str(store), split, name
            )
    # byte-parity probe: converted == generated (PNG round trip is lossless
    # for u8 RGB and u16 mm depth)
    a = load_scene(str(gen_root), "train", "ref000")
    b = load_scene(str(store), "train", "ref000")
    assert (a["rgb"] == b["rgb"]).all(), "RGB changed through the pipeline"
    assert abs(a["depth_m"] - b["depth_m"]).max() < 1e-6, "depth changed"
    report["roundtrip"] = "rgb exact, depth exact (mm-quantized at source)"

    # 4. train via the real CLI
    common = [
        sys.executable, "-m", "splatter360_tpu.main",
        "configs/synthetic_smoke.yaml",
        f"dataset.roots=[{store}]", "dataset.image_shape=[64,128]",
        "dataset.view_sampler.max_distance_between_context_views=5",
        *TINY_MODEL,
        f"trainer.max_steps={steps}",
        "trainer.print_log_every_n_steps=10",
        f"checkpointing.every_n_train_steps={steps}",
        f"output_dir={out_dir}",
    ]
    r = subprocess.run(common, capture_output=True, text=True)
    tail = "\n".join(r.stdout.strip().splitlines()[-3:])
    print(tail)
    assert r.returncode == 0, r.stderr[-2000:]
    report["train"] = {"steps": steps, "log_tail": tail}

    # 5. eval (mode=test)
    r = subprocess.run(
        common + ["mode=test", "test.eval_depth=true",
                  f"test.output_path={out_dir}/test"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    scores = json.load(open(out_dir / "test" / "scores_all_avg.json"))
    report["eval_scores"] = scores
    print(json.dumps(scores))

    with open("REFPIPE.json", "w") as f:
        json.dump(report, f, indent=1)
    print("REFPIPE.json written")


if __name__ == "__main__":
    main()
