"""T5 score-weighted suggestion sampling (reference:
convolution_module.py:157-205 ``_sample_suggestions``).

Driver-side numpy on tiny per-survey collections (≤ result_num ≈ 10 rows —
the one place SURVEY.md §2.6 sanctions driver logic), but seeded: each
survey gets its own ``RandomState(seed ⊕ hash(survey_id))`` so results are
reproducible AND independent of the order surveys are processed in.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


def survey_seed(survey_id: str, seed: int = 42) -> int:
    h = int(hashlib.md5(f"{survey_id}#{seed}".encode()).hexdigest()[:8], 16)
    return (seed * 1_000_003 + h) % (2**31 - 1)


def sample_suggestion_groups(
    sugg_ids: list[str],
    scores: list[float],
    receptive_field: int,
    result_num: int,
    rng: np.random.RandomState,
) -> list[list[str]]:
    """Port of ``_sample_suggestions``: no-duplicate partition sampling when
    suggestions/field exceeds result_num, else score-weighted sampling
    without replacement per group, rejecting repeated combos."""
    n = len(sugg_ids)
    if n == 0:
        return []
    ids = list(sugg_ids)
    if result_num < n / receptive_field:
        perm = rng.permutation(n)
        shuffled = [ids[i] for i in perm]
        return [shuffled[i:i + receptive_field]
                for i in range(0, n, receptive_field)]

    p = np.asarray(scores, dtype=float)
    # zero-score suggestions would make choice(replace=False) infeasible
    # when fewer than receptive_field entries are non-zero — fall back to
    # uniform weights in that case (the reference crashes here).
    if p.sum() <= 0 or (p > 0).sum() < min(receptive_field, n):
        p = np.ones(n)
    p = p / p.sum()
    all_combos = math.comb(n, receptive_field) if n >= receptive_field else 1
    sampled: list[list[str]] = []
    seen: set[tuple] = set()
    guard = 0
    while len(sampled) < result_num and guard < result_num * 50:
        guard += 1
        if n < receptive_field:
            idx = rng.choice(np.arange(n), size=n, replace=True)
        else:
            idx = rng.choice(n, size=receptive_field, replace=False, p=p)
        combo = tuple(sorted(int(i) for i in idx))
        if combo not in seen or len(seen) >= all_combos:
            seen.add(combo)
            sampled.append([ids[int(i)] for i in idx])
    return sampled
