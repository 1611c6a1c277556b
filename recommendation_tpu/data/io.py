"""Raw data I/O (layer L1).

Behavior contract (SURVEY.md §2.3, built once): whitespace-split lines of
``user item [rating]``; first two columns used, weight defaults to 1.0; blank
lines skipped; a missing file returns ``[]``. This matches the ~10 duplicated
``load_data`` copies in the reference (`ssl4rec.py:53-56`, `ncl.py:542-543`,
`directau.py:91-92`) and the richer ``FileIO.load_data_set``
(`selfcf.py:80-91`).

A native C++ fast path (``recommendation_tpu/native``) parses large files with
a single pass over an mmapped buffer; the Python path is the always-available
fallback and the semantics oracle.
"""

from __future__ import annotations

import os
from typing import List


def _load_data_python(path: str, with_weight: bool = True) -> List[list]:
    data = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            user, item = parts[0], parts[1]
            if with_weight and len(parts) >= 3:
                try:
                    weight = float(parts[2])
                except ValueError:
                    weight = 1.0
            else:
                weight = 1.0
            data.append([user, item, weight])
    return data


def load_data(path: str, with_weight: bool = True) -> List[list]:
    """Parse ``user item [rating]`` triples; missing file -> [].

    Always the Python path: for a list-of-lists result, Python list
    construction dominates and the native parser gains nothing (measured).
    The native win is ``Interaction.from_files``, which keeps the parse
    output as int32/float32 ARRAYS end-to-end."""
    if not os.path.exists(path):
        return []
    return _load_data_python(path, with_weight)


class FileIO:
    """File helpers matching `selfcf.py:69-91` semantics."""

    @staticmethod
    def load_data_set(path: str) -> List[list]:
        return load_data(path)

    @staticmethod
    def write_file(dir_path: str, filename: str, content) -> None:
        os.makedirs(dir_path, exist_ok=True)
        with open(os.path.join(dir_path, filename), "w") as f:
            if isinstance(content, str):
                f.write(content)
            else:
                f.writelines(content)
