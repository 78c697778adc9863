"""Example-problem loader (reference ``pyamg/gallery/example.py:14``).

The reference ships ``.mat`` files under ``pyamg/gallery/example_data``.
This loader searches (in order): ``$PYAMG_TPU_EXAMPLE_DATA``, a local
``example_data`` directory next to this file, and an installed ``pyamg``
package's data directory — the same file format either way.
"""

from __future__ import annotations

import os

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))


def _data_dirs():
    dirs = []
    env = os.environ.get("PYAMG_TPU_EXAMPLE_DATA")
    if env:
        dirs.append(env)
    dirs.append(os.path.join(_here, "example_data"))
    try:
        import pyamg.gallery as _pg
        dirs.append(os.path.join(os.path.dirname(_pg.__file__),
                                 "example_data"))
    except Exception:
        pass
    for cand in ("/root/reference/pyamg/gallery/example_data",):
        dirs.append(cand)
    return [d for d in dirs if os.path.isdir(d)]


def _examples():
    names = set()
    for d in _data_dirs():
        for f in os.listdir(d):
            if f.endswith(".mat"):
                names.add(f[:-4])
    return sorted(names)


def load_example(name, device=True):
    """Load an example dataset by name (reference ``example.py:14``).

    Returns a dict with 'A' (device ELL unless ``device=False``) plus any
    of 'B', 'vertices', 'elements', 'docstring' present in the file.
    """
    from scipy.io import loadmat
    for d in _data_dirs():
        path = os.path.join(d, name + ".mat")
        if os.path.isfile(path):
            raw = loadmat(path)
            data = {}
            for k, v in raw.items():
                if k.startswith("__"):
                    continue
                if k == "A":
                    import scipy.sparse as sp
                    A = sp.csr_matrix(v)
                    if device:
                        from pyamg_tpu.sparse.matrix import from_scipy
                        data["A"] = from_scipy(A)
                    else:
                        data["A"] = A
                elif k == "docstring":
                    data[k] = str(np.ravel(v)[0]) if np.size(v) else ""
                else:
                    data[k] = np.asarray(v)
            return data
    avail = _examples()
    raise ValueError(f"no example matrix named {name!r}; "
                     f"available: {avail}")
