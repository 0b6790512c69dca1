"""Parallel map with a progress bar.

The reference wires tqdm into joblib pools (`utils/joblib.py:22-38`); this
framework uses threads (the work is numpy/IO-bound and releases the GIL),
so the equivalent is a thread-pool map with optional tqdm.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, List, Optional


def progress_map(fn: Callable, items: Iterable, n_jobs: int = 8,
                 desc: Optional[str] = None) -> List:
    items = list(items)
    try:
        from tqdm.auto import tqdm

        bar = tqdm(total=len(items), desc=desc, dynamic_ncols=True)
    except ImportError:  # pragma: no cover
        bar = None
    results = [None] * len(items)
    with ThreadPoolExecutor(max_workers=n_jobs) as ex:
        from concurrent.futures import as_completed

        futures = {ex.submit(fn, it): i for i, it in enumerate(items)}
        for fut in as_completed(futures):
            results[futures[fut]] = fut.result()
            if bar is not None:
                bar.update(1)
    if bar is not None:
        bar.close()
    return results
