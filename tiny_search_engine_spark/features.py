"""D1-D10 per-(query,doc) features — the Arrow-batched kernel used by
QueryEngine.search()'s ``applyInPandas`` stage.

Pure functions of (query info, doc arrays, match records); formula-faithful
to /root/reference/src/table.cpp:693-1021 with the golden model's pinned
determinism (float64, records in ascending term_sign order). The DP
features (LCS/LCSubstr/edit distance, table.cpp:839-937 +
include/math_util.h:240-307) have no Spark builtin at term granularity —
this module IS the "custom operator as pandas UDF" escape hatch.

The reference computes these in an OpenMP parallel-for over the top-200
candidates (table.cpp:665-668); here each query group is one Arrow batch
and executor-level parallelism replaces the thread pool.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .config import BM25Profile

_FLT_EPS = 1.1920928955078125e-07


def _as_np(a) -> np.ndarray:
    if isinstance(a, (bytes, bytearray)):
        return np.frombuffer(bytes(a), dtype=np.uint8).astype(np.int64)
    return np.asarray(a, dtype=np.int64)


def _lcs(a, b) -> int:
    """Reference LCS recurrence (math_util.h:262-282), numpy row DP.

    The left-cell dependency vanishes because when chars match
    prev[j-1]+1 dominates both neighbors, so cur[j] =
    max(prev[j], match-diag, cur[j-1]) = a running max — one
    maximum.accumulate per row instead of a Python inner loop. LCS is
    symmetric, so the shorter sequence drives the rows (queries are a
    handful of terms/bytes; docs are thousands)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    A, B = _as_np(a), _as_np(b)
    if len(A) > len(B):
        A, B = B, A
    prev = np.zeros(len(B) + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for ai in A:
        diag = np.where(B == ai, prev[:-1] + 1, 0)
        cur[0] = 0
        np.maximum.accumulate(np.maximum(prev[1:], diag), out=cur[1:])
        prev, cur = cur, prev
    return int(prev[-1])


def _lcsubstr(a, b) -> int:
    """Reference LCSubstr (math_util.h:284-307); empty input → -1.
    Row DP depends on the previous row only → one vectorized
    where/shift per row. (With both sides non-empty the reference's
    every-cell `> best` scan makes the result max(0, longest run).)"""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return -1
    A, B = _as_np(a), _as_np(b)
    if len(A) > len(B):
        A, B = B, A
    prev = np.zeros(len(B), dtype=np.int64)
    best = 0
    for ai in A:
        cur = np.where(B == ai, 1, 0)
        cur[1:] += np.where(B[1:] == ai, prev[:-1], 0)
        m = int(cur.max())
        if m > best:
            best = m
        prev = cur
    return best


def _edit_distance(a, b) -> int:
    """Unit-cost Levenshtein, numpy row DP. The left-cell dependency
    cur[j] = min(z[j], cur[j-1]+1) unrolls to
    cur[j] = j + running_min(z[k] - k), so each row is one
    minimum.accumulate instead of a Python inner loop."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    A, B = _as_np(a), _as_np(b)
    if len(A) > len(B):  # symmetric; shorter side drives the rows
        A, B = B, A
    n = len(B)
    j_idx = np.arange(1, n + 1, dtype=np.int64)
    prev = np.arange(n + 1, dtype=np.int64)
    zbuf = np.empty(n + 1, dtype=np.int64)
    for i, ai in enumerate(A, 1):
        z = np.minimum(prev[:-1] + (B != ai), prev[1:] + 1)
        zbuf[0] = i  # base cur[0]=i enters the scan at offset 0
        np.subtract(z, j_idx, out=zbuf[1:])
        np.minimum.accumulate(zbuf, out=zbuf)
        prev[0] = i
        np.add(zbuf[1:], j_idx, out=prev[1:])
    return int(prev[-1])


def _stddev(xs) -> float:
    if len(xs) == 0:
        return 0.0
    m = sum(xs) / len(xs)
    return math.sqrt(sum((x - m) ** 2 for x in xs) / len(xs))


def _fdiv(a: float, b: float) -> float:
    if b == 0.0:
        return float("nan") if a == 0.0 else math.copysign(math.inf, a)
    return a / b


def _pair_sign(s1: int, s2: int) -> int:
    a = (s1 % (1 << 64)) & 0xFFFFFFFF
    b = (s2 % (1 << 64)) & 0xFFFFFFFF
    return (a << 32) | b


def round_sig(x: float, digits: int = 3) -> float:
    """D11 feature-export rounding: the reference rounds to N SIGNIFICANT
    digits (stringstream setprecision, include/math_util.h:153-159 — not
    decimal places). Applied only at export, never in the ranking path."""
    if x == 0 or not math.isfinite(x):
        return x
    return float(f"{x:.{digits}g}")


def export_feature_map(features: dict[str, float], digits: int = 3) -> dict[str, float]:
    """D11: the FeatureMgr name→float map as dumped by the reference
    (feature_mgr.h:44-71, values 3-significant-digit rounded)."""
    return {k: round_sig(v, digits) for k, v in features.items()}


RANKERS = ("vsm", "bm25", "coverage")


def compute_features_pdf(
    qi: dict,
    pdf: pd.DataFrame,
    stop_signs: set[int],
    prof: BM25Profile,
    avg_doc_len: float,
    ranker: str = "vsm",
    emit_features: bool = False,
    compat_ref: bool = False,
) -> pd.DataFrame:
    """One query group: pdf rows = funnel-surviving candidates with
    columns (doc_id, term_hits, matches, toks, doc_len, vec_module,
    wei_sum, content, ...). Returns scored rows.

    ``ranker`` picks the final score: ``vsm`` (the reference's shipped
    choice, table.cpp:709), ``bm25``, or ``coverage`` = cqr·ctr (the
    reference's V0.1 scorer, README.md:50-57 version table). ``vsm`` and
    ``bm25`` use the fast inline kernels; the full 38-feature map (D11)
    is computed only when ``emit_features`` or ``ranker='coverage'``
    asks for it, via full_feature_map — one shared code path with the
    golden model, exported 3-significant-digit rounded."""
    if ranker not in RANKERS:
        raise ValueError(f"unknown ranker {ranker!r}; one of {RANKERS}")
    q_signs: list[int] = qi["signs"]
    q_wei: list[float] = qi["wei"]
    q_module: float = qi["vec_module"]
    need_full = emit_features or ranker == "coverage"

    out = {
        "query_id": [], "doc_id": [], "term_hits": [],
        "final_score": [], "vsm": [], "bm25": [],
    }
    feats: list[dict] = []
    for row in pdf.itertuples():
        toks = row.toks  # sorted array of {pos, term_sign, offset, length, wei}
        d_signs = [int(t["term_sign"]) for t in toks]
        d_weis = [float(t["wei"]) for t in toks]
        matches = sorted(row.matches, key=lambda m: int(m["term_sign"]))
        doc_len = int(row.doc_len)
        d_module = float(row.vec_module)

        # ---- D1 VSM (table.cpp:713-754) — the final score ----
        vsm = 0.0
        if abs(q_module) > _FLT_EPS and abs(d_module) > _FLT_EPS:
            wm: dict[int, list[float]] = {}
            for i, s in enumerate(q_signs):
                if s in stop_signs:
                    continue
                wm.setdefault(s, [q_wei[i], 0.0])
            for i, s in enumerate(d_signs):
                if s in stop_signs:
                    continue
                if s in wm:
                    wm[s][1] = d_weis[i]
                else:
                    wm[s] = [0.0, d_weis[i]]
            dot = sum(v[0] * v[1] for _, v in sorted(wm.items()))
            vsm = dot / (q_module * d_module)

        # ---- D2 BM25 ----
        bm25 = 0.0
        for m in matches:
            tf_d = int(m["tf_d"])
            tf_q = int(m["tf_q"])
            kd = prof.k1 * (1 - prof.b + prof.b * doc_len / avg_doc_len)
            bm25 += (
                float(m["idf"])
                * (tf_d * (prof.k1 + 1) / (tf_d + kd))
                * (tf_q * (prof.k2 + 1) / (tf_q + prof.k2))
            )

        fmap: dict[str, float] | None = None
        if need_full:
            term_map = qi["term_map"]
            d_off_by_sign: dict[int, list[int]] = {}
            for t in toks:
                d_off_by_sign.setdefault(int(t["term_sign"]), []).append(
                    int(t["offset"])
                )
            fm_matches = []
            for m in matches:
                s = int(m["term_sign"])
                # D8 q_offsets donor mirrors fill_match_term_info
                # (table.cpp:443-471, golden model.py fill_match): a
                # synonym match inherits the ORIGINAL query term's
                # offsets (fixed), or the arg-order-bug donors term 0 /
                # term 1 (reference compat); everything else looks up
                # its own sign (operator[] default-insert → empty).
                if compat_ref:
                    if bool(m["is_disc"]) and int(m["disc_i"]) != 0:
                        donor = q_signs[0] if int(m["kind"]) == 0 else q_signs[1]
                    else:
                        donor = s
                else:
                    donor = q_signs[int(m["i"])] if int(m["kind"]) == 1 else s
                fm_matches.append(
                    {
                        "term_sign": s,
                        "tf_q": int(m["tf_q"]),
                        "tf_d": int(m["tf_d"]),
                        "idf": float(m["idf"]),
                        "term_len": int(m["term_len"]),
                        "q_offsets": tuple(term_map[donor][2]) if donor in term_map else (),
                        "d_offsets": tuple(d_off_by_sign.get(s, ())),
                    }
                )
            fmap = full_feature_map(
                qi,
                {
                    "signs": d_signs,
                    "wei": d_weis,
                    "doc_len": doc_len,
                    "vec_module": d_module,
                    "wei_sum": float(row.wei_sum),
                    "text": row.content,
                },
                fm_matches,
                stop_signs,
                prof,
                avg_doc_len,
            )

        final = (
            vsm
            if ranker == "vsm"
            else bm25
            if ranker == "bm25"
            else fmap["F_QU_TERM_WEI_COVERAGE"]
        )
        out["query_id"].append(int(row.query_id))
        out["doc_id"].append(int(row.doc_id))
        out["term_hits"].append(int(row.term_hits))
        out["final_score"].append(final)  # vsm default: table.cpp:709
        out["vsm"].append(vsm)
        out["bm25"].append(bm25)
        if emit_features:
            feats.append(export_feature_map(fmap))

    cols = {
        "query_id": pd.Series(out["query_id"], dtype="int64"),
        "doc_id": pd.Series(out["doc_id"], dtype="int64"),
        "term_hits": pd.Series(out["term_hits"], dtype="int64"),
        "final_score": pd.Series(out["final_score"], dtype="float64"),
        "vsm": pd.Series(out["vsm"], dtype="float64"),
        "bm25": pd.Series(out["bm25"], dtype="float64"),
    }
    if emit_features:
        cols["features"] = pd.Series(feats, dtype="object")
    return pd.DataFrame(cols)


def full_feature_map(
    qi: dict,
    doc: dict,
    matches: list[dict],
    stop_signs: set[int],
    prof: BM25Profile,
    avg_doc_len: float,
) -> dict[str, float]:
    """The complete 38-feature map (conf/feature.conf) for one (query,doc)
    pair — used by the feature-export API and the golden-parity tests."""
    f: dict[str, float] = {}
    q_signs = qi["signs"]
    term_map = qi["term_map"]
    qlen = qi["query_len"]
    nq = len(q_signs)
    d_signs = doc["signs"]
    nd = len(d_signs)
    doc_len = doc["doc_len"]
    qb, db = qi["query"].encode(), doc["text"].encode()

    matches = sorted(matches, key=lambda m: m["term_sign"])
    match_signs = {m["term_sign"] for m in matches}
    hit_freqs = {m["term_sign"]: min(m["tf_q"], m["tf_d"]) for m in matches}
    term_hits = sum(hit_freqs.values())
    f["F_QU_HIT_TERM_CNT"] = float(term_hits)

    # D1 VSM
    vsm = 0.0
    if abs(qi["vec_module"]) > _FLT_EPS and abs(doc["vec_module"]) > _FLT_EPS:
        wm: dict[int, list[float]] = {}
        for i, s in enumerate(q_signs):
            if s in stop_signs:
                continue
            wm.setdefault(s, [qi["wei"][i], 0.0])
        for i, s in enumerate(d_signs):
            if s in stop_signs:
                continue
            if s in wm:
                wm[s][1] = doc["wei"][i]
            else:
                wm[s] = [0.0, doc["wei"][i]]
        vsm = sum(v[0] * v[1] for _, v in sorted(wm.items())) / (
            qi["vec_module"] * doc["vec_module"]
        )
    f["F_QU_VSM"] = vsm

    # D2 BM25
    bm25 = 0.0
    for m in matches:
        kd = prof.k1 * (1 - prof.b + prof.b * doc_len / avg_doc_len)
        bm25 += (
            m["idf"]
            * (m["tf_d"] * (prof.k1 + 1) / (m["tf_d"] + kd))
            * (m["tf_q"] * (prof.k2 + 1) / (m["tf_q"] + prof.k2))
        )
    f["F_QU_BM25"] = bm25

    # D3
    divisor = sum(
        hit_freqs[m["term_sign"]] * m["idf"]
        for m in matches
        if m["term_sign"] not in stop_signs
    )
    cqr = _fdiv(divisor, qi["wei_sum"])
    ctr = _fdiv(divisor, doc["wei_sum"])
    f["F_QU_TERM_WEI_CQR"] = cqr
    f["F_QU_TERM_WEI_CTR"] = ctr
    f["F_QU_TERM_WEI_COVERAGE"] = cqr * ctr
    f["F_QU_MISS"] = 1 - cqr

    # D5 scatter
    overlap = sum(m["term_len"] * hit_freqs[m["term_sign"]] for m in matches)
    extra = float((qlen - overlap) % (1 << 32)) / (qlen + 1)
    f["F_QU_EXTRA"] = extra
    f["F_Q_LEN"] = float(qlen)
    f["F_U_LEN"] = float(doc_len)
    f["F_QU_STR_LEN_CQR"] = _fdiv(float(overlap), qlen)
    f["F_QU_STR_LEN_CTR"] = _fdiv(float(overlap), doc_len)
    f["F_QU_STR_LEN_COVERAGE"] = f["F_QU_STR_LEN_CQR"] * f["F_QU_STR_LEN_CTR"]
    f["F_Q_TERM_CNT"] = float(nq)
    f["F_U_TERM_CNT"] = float(nd)
    f["F_QU_TERM_CNT_CQR"] = _fdiv(float(term_hits), nq)
    f["F_QU_TERM_CNT_CTR"] = _fdiv(float(term_hits), nd)
    f["F_QU_TERM_CNT_COVERAGE"] = f["F_QU_TERM_CNT_CQR"] * f["F_QU_TERM_CNT_CTR"]

    # D4 order overlap
    t_lcseq, t_lcstr = _lcs(q_signs, d_signs), _lcsubstr(q_signs, d_signs)
    s_lcseq, s_lcstr = _lcs(qb, db), _lcsubstr(qb, db)
    f["F_QU_TERM_LCSEQ"] = float(t_lcseq)
    f["F_QU_TERM_LCSEQ_OVER_Q"] = _fdiv(float(t_lcseq), nq)
    f["F_QU_TERM_LCSEQ_OVER_U"] = _fdiv(float(t_lcseq), nd)
    f["F_QU_TERM_LCSTR"] = float(t_lcstr)
    f["F_QU_TERM_LCSTR_OVER_Q"] = _fdiv(float(t_lcstr), nq)
    f["F_QU_TERM_LCSTR_OVER_U"] = _fdiv(float(t_lcstr), nd)
    f["F_QU_STR_LCSEQ"] = float(s_lcseq)
    f["F_QU_STR_LCSEQ_OVER_Q"] = _fdiv(float(s_lcseq), len(qb))
    f["F_QU_STR_LCSEQ_OVER_U"] = _fdiv(float(s_lcseq), len(db))
    f["F_QU_STR_LCSTR"] = float(s_lcstr)
    f["F_QU_STR_LCSTR_OVER_Q"] = _fdiv(float(s_lcstr), len(qb))
    f["F_QU_STR_LCSTR_OVER_U"] = _fdiv(float(s_lcstr), len(db))

    # D6 edit distance
    t_ed = _edit_distance(q_signs, d_signs)
    s_ed = _edit_distance(qb, db)
    f["F_QU_TERM_EDIST"] = float(t_ed)
    f["F_QU_TERM_EDIST_OVER_Q"] = _fdiv(float(t_ed), nq)
    f["F_QU_TERM_EDIST_OVER_U"] = _fdiv(float(t_ed), nd)
    f["F_QU_STR_EDIST"] = float(s_ed)
    f["F_QU_STR_EDIST_OVER_Q"] = _fdiv(float(s_ed), qlen)
    f["F_QU_STR_EDIST_OVER_U"] = _fdiv(float(s_ed), doc_len)

    # D7 disorder
    disorder_v = 0.0
    if len(matches) > 1:
        qpairs = set()
        qhits = [s for s in q_signs if s in match_signs]
        for i in range(len(qhits)):
            for j in range(i + 1, len(qhits)):
                qpairs.add(_pair_sign(qhits[i], qhits[j]))
        dhits = [s for s in d_signs if s in match_signs]
        order = dis = 0
        for i in range(len(dhits)):
            for j in range(i + 1, len(dhits)):
                if _pair_sign(dhits[i], dhits[j]) in qpairs:
                    order += 1
                if _pair_sign(dhits[j], dhits[i]) in qpairs:
                    dis += 1
        disorder_v = dis / (order + dis + 1)
    f["F_QU_DISORDER"] = disorder_v

    # D8 diversity
    q_off: list[int] = []
    d_off: list[int] = []
    for m in matches:
        q_off.extend(m.get("q_offsets", ()))
        d_off.extend(m.get("d_offsets", ()))
    f["F_QU_HIT_DIVERSITY"] = _stddev(d_off) - _stddev(q_off)

    # D9 proximity
    f["F_QU_PROXIMITY"] = math.pow(0.9, f["F_QU_MISS"] + extra + disorder_v)
    return f
