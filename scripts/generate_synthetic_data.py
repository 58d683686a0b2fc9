"""Generate synthetic RGB-D panorama scenes for smoke training / benchmarking.

Usage: python scripts/generate_synthetic_data.py [root] [n_train] [n_test]
"""

import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "datasets/synth"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_test = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from splatter360_tpu.data.scene_io import write_synthetic_scene

    for i in range(n_train):
        info = write_synthetic_scene(
            root, "train", f"synth{i:03d}", n_frames=24, seed=i
        )
        print("train", i, info)
    for i in range(n_test):
        info = write_synthetic_scene(
            root, "test", f"synthtest{i:03d}", n_frames=24, seed=100 + i
        )
        print("test", i, info)


if __name__ == "__main__":
    main()
