"""Deterministic weighted corpus mixing (scale addition — the
data-mixing step of a training pipeline: combine N curated corpora at
target proportions into one shuffled training stream; the reference
has no mixing surface, its nearest analogue is the fixed eval split in
scripts/evaluate_tkg.py).

Semantics: given corpora with row counts n_i and mixture weights w_i,
take the LARGEST downsample-only mixture with composition ∝ w_i —
t = min_i(n_i / w_i) rows per unit weight, so corpus i contributes
~t·w_i rows (``scale`` shrinks the total). Membership per corpus is
the md5 expected-fraction filter from stages/sampling.py (streaming,
no shuffle; realized size concentrates at t·w_i ± O(sqrt)); the
output order is the md5 deterministic shuffle from stages/shuffle.py
over the corpus-qualified key. Everything is a pure function of the
rows: re-runs, retries and block layouts reproduce the identical
mixture, and both the membership and the order have exact DuckDB
oracles (md5 string compare / ORDER BY md5).

Scale notes (100 TB): per-corpus filters stream (one pass, no
shuffle); the only all-to-all is the final shuffle every mixture needs
anyway, and it goes through the md5-prefix-range shard trick (one
bucketed groupby, no global sort). Upsampling a small corpus is
epoch-repetition by contract: call with a different ``seed`` per epoch
and concatenate — disjoint seeds give independent permutations.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .sampling import fraction_threshold_hex, sample_fraction
from .shuffle import deterministic_shuffle

_CORPUS_COL = "corpus"
_MIXKEY_COL = "mix_key"


def mixture_plan(counts: dict[str, int], weights: dict[str, float],
                 scale: float = 1.0) -> dict[str, float]:
    """Per-corpus keep fraction for the largest (×``scale``)
    downsample-only mixture with composition ∝ weights."""
    if set(counts) != set(weights):
        raise ValueError("counts and weights must cover the same corpora")
    if not 0.0 < scale <= 1.0:
        raise ValueError(f"scale must be in (0, 1], got {scale}")
    bad = {k for k, w in weights.items() if w <= 0}
    if bad:
        raise ValueError(f"weights must be positive: {sorted(bad)}")
    t = min(counts[k] / weights[k] for k in counts) * scale
    return {k: min(1.0, t * weights[k] / counts[k]) if counts[k]
            else 0.0 for k in counts}


def mix_corpora(corpora: dict, weights: dict[str, float],
                key_col: str, seed: int = 0, scale: float = 1.0,
                num_shards: int = 64,
                counts: dict[str, int] | None = None):
    """Mix column-aligned Datasets into one deterministically shuffled
    stream. Adds ``corpus`` (source name), ``shard``/``pos`` (read in
    that order to replay the global permutation). ``counts`` skips the
    per-corpus count pass when the caller already knows the sizes."""
    if set(corpora) != set(weights):
        raise ValueError("corpora and weights must cover the same names")
    for name, ds in corpora.items():
        taken = {_CORPUS_COL, _MIXKEY_COL} & set(ds.schema().names)
        if taken:
            raise ValueError(f"corpus {name!r} already has reserved "
                             f"mixture column(s) {sorted(taken)}")
    if counts is None:
        # count over the key column only: the plan's projection pushdown
        # reads just (key_col + filter columns) from Parquet instead of
        # dragging full text payloads through a row-count pass. One
        # streaming shuffle-free count job per corpus — a fused
        # union + groupby(corpus).count() was measured SLOWER (it
        # exchanges every probe row where count() exchanges nothing).
        # The N jobs are submitted CONCURRENTLY (each .count() blocks
        # its thread on a separate Ray job): previously they ran
        # sequentially and the serialized per-job latency dominated
        # mix_corpora wall time.
        from concurrent.futures import ThreadPoolExecutor

        names = sorted(corpora)
        with ThreadPoolExecutor(max_workers=len(names)) as pool:
            futs = {k: pool.submit(
                        corpora[k].select_columns([key_col]).count)
                    for k in names}
            counts = {k: f.result() for k, f in futs.items()}
    fracs = mixture_plan(counts, weights, scale=scale)

    tagged = []
    for name in sorted(corpora):
        kept = sample_fraction(corpora[name], fracs[name], key_col,
                               seed=f"{seed}|{name}")

        def tag(t: pa.Table, _name=name) -> pa.Table:
            t = t.append_column(
                _CORPUS_COL, pa.array([_name] * t.num_rows, pa.string()))
            # corpus-qualified shuffle key: ids may collide across corpora
            mk = pc.binary_join_element_wise(
                pa.scalar(_name), t[key_col].cast(pa.string()), "|")
            return t.append_column(_MIXKEY_COL, mk)

        tagged.append(kept.map_batches(tag, batch_format="pyarrow"))

    unioned = tagged[0].union(*tagged[1:]) if len(tagged) > 1 else tagged[0]
    # the shuffle seed MUST differ from the sampling seeds: with the
    # same seed the shuffle rank md5(f"{seed}|{name}|{key}") would be
    # the very hash the membership filter thresholded on, so kept rows
    # (small hashes) of heavily-downsampled corpora would cluster at
    # the FRONT of the "shuffled" stream. '#shuffle' decorrelates.
    mixed = deterministic_shuffle(unioned, _MIXKEY_COL,
                                  seed=f"{seed}#shuffle",
                                  num_shards=num_shards)
    return mixed.drop_columns([_MIXKEY_COL])
