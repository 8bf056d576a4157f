"""Emit the per-sequence obj-extraction shell runfile for the raw DFAUST
registrations (reference datagen/generate_dfaust_obj_runfile.py): one
`write_sequence_to_obj` command per (subject, sequence) in the male/female
registration archives.

Rebuild notes: the DFAUST root is an argument instead of an imported
config constant, and the command list is returned so tests (and qdaq jobs)
can consume it without touching the filesystem.
"""
from __future__ import annotations

import argparse
import os

import h5py


def generate_runfile(dfaust_dir="datasets/DFAUST",
                     out_path="generate_dfaust_obj_all.sh",
                     python_cmd="python -m shapeformer_tpu.data."
                                "dfaust_datasets.datagen.write_sequence_to_obj"):
    tdir = os.path.join(dfaust_dir, "data")
    os.makedirs(tdir, exist_ok=True)
    fns = [os.path.join(dfaust_dir, f"registrations_{s}.hdf5")
           for s in ("m", "f")]
    lines = []
    for fn in fns:
        if not os.path.exists(fn):
            continue
        with h5py.File(fn, "r") as f:
            for key in f.keys():
                if key == "faces":
                    continue
                sid = key.split("_")[0]
                aid = "_".join(key.split("_")[1:])
                lines.append(f"{python_cmd} --path {fn} --seq {aid} "
                             f"--sid {sid} --tdir {tdir}")
    if out_path:
        with open(out_path, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
    return lines


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dfaust_dir", default="datasets/DFAUST")
    ap.add_argument("--out", default="generate_dfaust_obj_all.sh")
    ap.parse_args_ns = ap.parse_args()
    cmds = generate_runfile(ap.parse_args_ns.dfaust_dir, ap.parse_args_ns.out)
    print(f"{len(cmds)} commands -> {ap.parse_args_ns.out}")
