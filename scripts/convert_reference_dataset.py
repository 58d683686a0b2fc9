"""Convert reference-format HM3D/Replica scene directories into .s3z shards.

Reference layout per scene (SURVEY.md §3.4, preprocess/dataset_generation_*):
  <scene>/pano/%05d.png, <scene>/pano_depth/%05d.png (mm), rotation.npy,
  translation.npy

Usage: python scripts/convert_reference_dataset.py <src_root> <dst_root> <split>
"""

import sys
from pathlib import Path


def main():
    src, dst, split = sys.argv[1], sys.argv[2], sys.argv[3]

    from splatter360_tpu.data.scene_io import convert_reference_scene

    for scene_dir in sorted(Path(src).iterdir()):
        if not (scene_dir / "pano").exists():
            continue
        print("converting", scene_dir.name)
        convert_reference_scene(str(scene_dir), dst, split, scene_dir.name)


if __name__ == "__main__":
    main()
