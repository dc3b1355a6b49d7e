"""Deterministic synthetic transcript corpus + query set (FIXTURES.md).

Transposes the reference's evaluation inputs: the code CSVs
(``/root/reference/dh/tools/import_csv.py:265-346``) become the transcript
corpus; the val-query CSVs (``/root/reference/experiments/get_times.py:12-48``)
become the query table. Fully deterministic: all randomness is derived from
blake2b(seed, conv_id, ...) — no wall clock, no partition-order dependence; any
conversation is reproducible in isolation.

Schema (BASELINE.json input_hint):
    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

SEED = 42
EPOCH = np.datetime64("2026-01-01T00:00:00")

TIERS = {
    # tier -> (n_convs, vocab_size, n_queries)
    "t1": (50, 500, 50),
    "t2": (1000, 5000, 500),
    "bench": (20000, 50000, 500),
    # scaling-efficiency tier: large enough that per-stage fixed costs
    # (job scheduling, Python worker spin-up, write commits) are noise
    # against real compute at 8 cores vs 32 cores
    "scale": (80000, 100000, 500),
    # corpus-size linearity tier: 4x the scale tier (~6.7M turns). Used by
    # scripts/linearity_bench.py to show build turns/sec stays ~flat and
    # query wall grows sublinearly as the corpus grows 16x (bench->xl) —
    # the measured leg of the 10^12-turn extrapolation argument. Vocab
    # doubles (Heaps-ish growth) so per-term posting density scales like a
    # real corpus rather than just deepening every list.
    "xl": (320000, 200000, 500),
    # 64x the bench tier (~26.9M turns): extends the linearity curve one
    # more 4x step so the 10^12-turn extrapolation rests on a measured
    # 64x span, not 16x. Vocab doubles again (Heaps-ish), same as xl.
    "xxl": (1280000, 400000, 500),
}

HOT_TERM = "the"
ROLES = ("user", "assistant")
TOOLS = ("bash", "search", "edit")
_SEPS = (" ", " ", " ", ", ", "! ", ". ", " - ")  # punctuation noise


def _h64(*parts) -> int:
    key = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")


def _zipf_cdf(v: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, v + 1, dtype=np.float64), s)
    return np.cumsum(w) / w.sum()


@dataclass
class Tier:
    n_convs: int
    vocab: int
    n_queries: int


def _conv_rows(c: int, tier: Tier, cdf: np.ndarray, seed: int) -> list[tuple]:
    """All turns of one conversation; independent of every other conversation."""
    conv_id = f"conv{c:06d}"
    rng = np.random.Generator(np.random.PCG64(_h64(seed, conv_id)))
    n_turns = 2 + int(rng.integers(0, 39))  # [2, 40]
    rows = []
    for t in range(n_turns):
        r = rng.random(8)
        role = "tool" if r[0] < 0.10 else ROLES[t % 2]
        tool = TOOLS[int(r[1] * 3)] if role == "tool" else None
        if r[2] < 0.005:
            text = ""  # doclen=0 edge
        else:
            n_tok = 5 + int(r[3] * 115)  # [5, 120]
            draws = rng.random(n_tok)
            idx = np.searchsorted(cdf, draws)
            toks = [f"w{int(i):05d}" for i in idx]
            if r[4] < 0.60:
                toks[int(r[5] * len(toks))] = HOT_TERM  # hot-term skew
            if _h64(seed, conv_id, t, "rare") % 97 == 0:
                toks.append(f"rare{_h64(seed, conv_id, t, 'rareid') % 10**9:09d}")
            # case/punctuation noise to exercise the tokenizer
            noisy = []
            for j, tok in enumerate(toks):
                u = draws[j % n_tok]
                noisy.append(tok.upper() if u < 0.05 else (tok.capitalize() if u < 0.08 else tok))
            seps = [_SEPS[int(x * len(_SEPS))] for x in rng.random(len(noisy))]
            text = "".join(w + s for w, s in zip(noisy, seps)).rstrip()
        rows.append((conv_id, t, role, text, tool))
    return rows


def gen_transcripts(tier_name: str = "t1", seed: int = SEED) -> pd.DataFrame:
    tier = Tier(*TIERS[tier_name])
    cdf = _zipf_cdf(tier.vocab)
    rows: list[tuple] = []
    for c in range(tier.n_convs):
        rows.extend(_conv_rows(c, tier, cdf, seed))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    # ts strictly increasing from global turn ordinal (rows are generated in
    # (conv_id, turn_idx) order)
    df["ts"] = EPOCH + np.arange(len(df)).astype("timedelta64[s]")
    return df


def gen_queries(tier_name: str = "t1", seed: int = SEED) -> pd.DataFrame:
    """qid, text, k — mirrors the reference's shuffled query sweep
    (``experiments/get_times.py:8-19``) with the edge cases of FIXTURES.md §2."""
    tier = Tier(*TIERS[tier_name])
    ks = (1, 10, 100)
    rows = []
    for q in range(tier.n_queries):
        rng = np.random.Generator(np.random.PCG64(_h64(seed, "query", q)))
        kind = q % 5
        if kind == 0:  # hot-term only (max candidate set)
            terms = [HOT_TERM]
        elif kind == 1:  # contains a term absent from the corpus (df=0 edge)
            terms = [f"w{int(rng.integers(0, tier.vocab)):05d}", "zzabsentzz"]
        elif kind == 2:  # duplicate terms within one query
            t = f"w{int(rng.integers(0, tier.vocab)):05d}"
            terms = [t, t, HOT_TERM]
        else:  # 1-5 mixed-frequency terms
            n = 1 + int(rng.integers(0, 5))
            terms = [f"w{int(rng.integers(0, tier.vocab)):05d}" for _ in range(n)]
        rows.append((q, " ".join(terms), ks[q % 3]))
    return pd.DataFrame(rows, columns=["qid", "text", "k"]).astype({"qid": "int64", "k": "int32"})


def turn_counts(tier: Tier, seed: int = SEED) -> np.ndarray:
    """Deterministic turns-per-conversation (first draw of each conv RNG)."""
    return np.array(
        [
            2 + int(np.random.Generator(np.random.PCG64(_h64(seed, f"conv{c:06d}"))).integers(0, 39))
            for c in range(tier.n_convs)
        ]
    )


def gen_transcripts_spark(spark, tier_name: str = "bench", seed: int = SEED):
    """Distributed generator — row-identical to :func:`gen_transcripts` but
    produced in parallel with mapInPandas (the bench tier's 400k turns would
    take minutes single-threaded on the driver).
    """
    tier = Tier(*TIERS[tier_name])
    cdf = _zipf_cdf(tier.vocab)
    counts = turn_counts(tier, seed)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype("int64")
    src = spark.createDataFrame(
        pd.DataFrame({"c": np.arange(tier.n_convs, dtype="int64"), "offset": offsets})
    )

    def gen(batches):
        for b in batches:
            out = []
            for c, off in zip(b["c"], b["offset"]):
                for conv_id, t, role, text, tool in _conv_rows(int(c), tier, cdf, seed):
                    out.append((conv_id, t, role, text, tool, int(off) + t))
            pdf = pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "role", "text", "tool", "ord"]
            )
            pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
            pdf["ts"] = EPOCH + pdf.pop("ord").to_numpy().astype("timedelta64[s]")
            yield pdf

    par = spark.sparkContext.defaultParallelism
    return src.repartition(par).mapInPandas(
        gen, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def write_parquet(df: pd.DataFrame, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def write_corpus(out_dir: str, tier_name: str = "t1", seed: int = SEED) -> tuple[str, str]:
    """Write transcripts.parquet + queries.parquet under out_dir."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    tp = os.path.join(out_dir, "transcripts.parquet")
    qp = os.path.join(out_dir, "queries.parquet")
    write_parquet(gen_transcripts(tier_name, seed), tp)
    write_parquet(gen_queries(tier_name, seed), qp)
    return tp, qp
