"""Convert a reference-compatible ROS bag into the KAIST-style layout this
engine replays offline (the TPU-native stand-in for ``rosbag play`` into
the reference node, ``/root/reference/README.md:103-108``).

Usage:
    python tools/convert_bag.py urban38.bag outdir \
        --imu-topic /imu/data_raw --gnss-topic /gps/fix \
        --image-topic /stereo/left/image_raw

Then point the engine's KAIST loader (``ic_gvins_tpu/data/kaist.py``) or
``tools/run_sim.py``-style drivers at ``outdir``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bag")
    ap.add_argument("outdir")
    ap.add_argument("--imu-topic", default="/imu/data_raw")
    ap.add_argument("--gnss-topic", default="/gps/fix")
    ap.add_argument("--image-topic", default=None)
    ap.add_argument("--image-format", default="png", choices=["png", "npy"])
    ap.add_argument("--list-topics", action="store_true",
                    help="print topic -> type and exit")
    args = ap.parse_args()

    from ic_gvins_tpu.data import rosbag

    if args.list_topics:
        print(json.dumps(rosbag.bag_topics(args.bag), indent=2))
        return

    counts = rosbag.convert_bag(
        args.bag, args.outdir,
        imu_topic=args.imu_topic, gnss_topic=args.gnss_topic,
        image_topic=args.image_topic, image_format=args.image_format,
    )
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
