"""HDF5 ragged-array store, layout-compatible with the reference datasets.

The IMNet2 hdf5 files store ragged object arrays in "serial" form
(xgutils/nputil.py:742-960): for key K the file holds
  K                    -- flat concatenation of every element
  K_serial_dataBias    -- prefix offsets into K (len N+1)
  K_serial_shape       -- concatenated per-element shapes
  K_serial_shapeBias   -- prefix offsets into K_serial_shape (len N+1)
Plain rectangular datasets are stored directly.  H5Var exposes lazy per-index
reads so DataLoader-style random access never materializes the whole file.
"""
from __future__ import annotations

import os

import h5py
import numpy as np


def to_object_array(items):
    """1-D object array of arrays (np.array(list_of_same_shape, dtype=object)
    silently builds an N-D object array instead)."""
    out = np.empty(len(items), dtype=object)
    for i, x in enumerate(items):
        out[i] = np.asarray(x)
    return out


def serialize_array(obj_array):
    serial_data, serial_shape, data_bias, shape_bias = [], [], [0], [0]
    for array in obj_array:
        array = np.asarray(array)
        if array.dtype == np.dtype("O"):
            array = np.asarray(array.tolist())
        serial_data.append(array.reshape(-1))
        serial_shape.append(np.array(array.shape))
        shape_bias.append(shape_bias[-1] + len(array.shape))
        data_bias.append(data_bias[-1] + serial_data[-1].shape[0])
    return (np.concatenate(serial_data), np.array(data_bias),
            np.concatenate(serial_shape), np.array(shape_bias))


def deserialize_array(serial_data, data_bias, serial_shape, shape_bias):
    out = []
    for i in range(len(shape_bias) - 1):
        shape = serial_shape[shape_bias[i]:shape_bias[i + 1]]
        out.append(serial_data[data_bias[i]:data_bias[i + 1]].reshape(shape))
    try:
        return np.array(out)
    except ValueError:
        return np.array(out, dtype=object)


class H5Var:
    """Lazy random-access view of one (possibly ragged) dataset
    (nputil.H5Var, nputil.py:795-815)."""

    def __init__(self, path, dataset_name):
        self.path, self.dname = path, dataset_name

    def _is_serial(self, f):
        return f"{self.dname}_serial_dataBias" in f

    def __len__(self):
        with h5py.File(self.path, "r") as f:
            if self._is_serial(f):
                return f[f"{self.dname}_serial_dataBias"].shape[0] - 1
            return f[self.dname].shape[0]

    @property
    def shape(self):
        return len(self)

    def __getitem__(self, index):
        with h5py.File(self.path, "r") as f:
            if self._is_serial(f):
                if index is None:
                    return deserialize_array(
                        np.array(f[self.dname]),
                        np.array(f[f"{self.dname}_serial_dataBias"]),
                        np.array(f[f"{self.dname}_serial_shape"]),
                        np.array(f[f"{self.dname}_serial_shapeBias"]))
                if np.iterable(index):
                    items = [self._one(f, i) for i in index]
                    try:
                        return np.array(items)
                    except ValueError:
                        return np.array(items, dtype=object)
                return self._one(f, index)
            if index is None:
                return np.array(f[self.dname])
            return np.array(f[self.dname][index])

    def _one(self, f, index):
        db = f[f"{self.dname}_serial_dataBias"]
        sb = f[f"{self.dname}_serial_shapeBias"]
        shape = np.array(f[f"{self.dname}_serial_shape"][sb[index]:sb[index + 1]])
        return np.array(f[self.dname][db[index]:db[index + 1]]).reshape(shape)


def writeh5(path, data_dict, mode="w"):
    """Write a dict of arrays; dtype=object arrays go to serial ragged form
    (nputil.writeh5, nputil.py:936-960)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, mode) as f:
        for key, value in data_dict.items():
            value = np.asarray(value) if not isinstance(value, np.ndarray) else value
            if key in f:
                del f[key]
            if value.dtype == np.dtype("O"):
                sd, db, ss, sb = serialize_array(value)
                f[key] = sd
                f[f"{key}_serial_dataBias"] = db
                f[f"{key}_serial_shape"] = ss
                f[f"{key}_serial_shapeBias"] = sb
            elif value.dtype.type is np.str_:
                f[key] = np.char.encode(value, "UTF-8")
            else:
                f[key] = value


def readh5(path):
    out = {}
    with h5py.File(path, "r") as f:
        for key in f.keys():
            if "_serial_" in key:
                continue
            if f"{key}_serial_dataBias" in f:
                out[key] = deserialize_array(
                    np.array(f[key]),
                    np.array(f[f"{key}_serial_dataBias"]),
                    np.array(f[f"{key}_serial_shape"]),
                    np.array(f[f"{key}_serial_shapeBias"]))
            else:
                out[key] = np.array(f[key])
    return out
