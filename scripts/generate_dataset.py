"""Generate a procedural RGB-D panorama dataset (the preprocess/ pipeline).

Usage:
  python scripts/generate_dataset.py <root> [n_train] [n_test] \
      [--frames N] [--shape HxW] [--spacing S] [--via-cubes] [--seed K]

Reference parity: preprocess/generate_hm3d_train.sh + dataset_generation_*.py
(Habitat-sim replaced by procedural worlds rendered with our own renderer).
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("n_train", type=int, nargs="?", default=4)
    ap.add_argument("n_test", type=int, nargs="?", default=1)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--shape", default="128x256")
    ap.add_argument("--spacing", type=float, default=0.09)
    ap.add_argument("--via-cubes", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--validate", action="store_true",
                    help="cross-view RGB-D consistency check per scene "
                         "(preprocess/check_eipipolar.py parity)")
    args = ap.parse_args()
    h, w = (int(x) for x in args.shape.lower().split("x"))

    from splatter360_tpu.preprocess import generate_scene
    from splatter360_tpu.preprocess.validate import check_scene_consistency

    for split, count, base in (("train", args.n_train, 0),
                               ("test", args.n_test, 10_000)):
        for i in range(count):
            info = generate_scene(
                args.root, split, f"proc{base + i:05d}",
                n_frames=args.frames, image_shape=(h, w),
                seed=args.seed + base + i, spacing=args.spacing,
                via_cubes=args.via_cubes,
            )
            print(split, info)
            if args.validate:
                stats = check_scene_consistency(
                    args.root, split, f"proc{base + i:05d}"
                )
                print(split, "consistency", stats)
                assert stats["coverage"] > 0.05, "degenerate scene geometry"
                assert stats["depth_absrel"] < 0.05, "inconsistent depth"



if __name__ == "__main__":
    main()
