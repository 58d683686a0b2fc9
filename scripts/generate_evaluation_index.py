"""Generate a fixed evaluation index JSON (SURVEY.md §3.5 parity).

Usage:
  python scripts/generate_evaluation_index.py <root> <split> <out.json> \
      [frame_interval] [num_targets] [--video]
"""

import sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    root, split, out = args[0], args[1], args[2]
    frame_interval = int(args[3]) if len(args) > 3 else 100
    num_targets = int(args[4]) if len(args) > 4 else 3
    video = "--video" in sys.argv

    from splatter360_tpu.evaluation.index_generator import (
        IndexGeneratorConfig, generate_index,
    )

    idx = generate_index(
        [root], split, out,
        IndexGeneratorConfig(
            frame_interval=frame_interval,
            num_target_views=num_targets,
            video=video,
        ),
    )
    print(f"wrote {len(idx)} scenes to {out}")


if __name__ == "__main__":
    main()
