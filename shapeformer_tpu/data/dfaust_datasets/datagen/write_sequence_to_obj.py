"""D-FAUST preprocessing: export per-frame objs from the registrations hdf5.

Parity with datagen/write_sequence_to_obj.py (itself derived from the public
D-FAUST release scripts): registrations_{f,m}.hdf5 stores each sequence as a
(V, 3, T) vertex track plus a shared 'faces' array; this writes
<tdir>/<sid>_<seq>/NNNNN.obj per frame.
"""
from __future__ import annotations

import argparse
import os
import sys

import h5py
import numpy as np

from ....utils.geoutil import write_obj

SUBJECT_IDS = ["50002", "50004", "50007", "50009", "50020",
               "50021", "50022", "50025", "50026", "50027"]


def export_sequence(h5_path, sid, seq, target_dir="./"):
    sidseq = f"{sid}_{seq}"
    with h5py.File(h5_path, "r") as f:
        if sidseq not in f:
            raise KeyError(f"Sequence {seq} of subject {sid} not in {h5_path}")
        verts = np.array(f[sidseq]).transpose(2, 0, 1)   # (T, V, 3)
        faces = np.array(f["faces"])
    out_dir = os.path.join(target_dir, sidseq)
    os.makedirs(out_dir, exist_ok=True)
    for i, v in enumerate(verts):
        write_obj(os.path.join(out_dir, f"{i:05d}.obj"), v, faces)
    return out_dir, len(verts)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Save D-FAUST sequence registrations as obj frames")
    p.add_argument("--path", type=str, default="../registrations_f.hdf5")
    p.add_argument("--seq", type=str, default="jiggle_on_toes")
    p.add_argument("--sid", type=str, default="50004", choices=SUBJECT_IDS)
    p.add_argument("--tdir", type=str, default="./")
    args = p.parse_args(argv)
    try:
        out_dir, n = export_sequence(args.path, args.sid, args.seq, args.tdir)
        print(f"wrote {n} frames to {out_dir}")
    except KeyError as e:
        print(e)
        sys.exit(1)


if __name__ == "__main__":
    main()
