"""Golden model: a pure-Python, loop-faithful reimplementation of the
reference pipeline (MarinYoung4596/tiny_search_engine), used as the oracle
for the Spark engine's rank-identity tests.

Faithfulness notes (every quirk replicated deliberately; cites into
/root/reference/):

* idf = log((N - ttf + 0.5) / (ttf + 0.5)) where **ttf is total term
  frequency over docs, not doc frequency** (param is misnamed `doc_freq`;
  callers pass term_info->term_freq — src/table.cpp:295,304,
  src/math_util.cpp:19-23). Can go negative for hot terms.
* doc/query weight per occurrence wei = idf (tf multiply commented out,
  src/table.cpp:319,627); vec_module/wei_sum sum **per occurrence**
  (dups counted each time), stopwords skipped (src/table.cpp:309-327).
* doc_len/query_len = last token offset+length in unicode chars
  (src/node_def.cpp:100-103, src/table.cpp:646-648).
* the C4 argument-order bug (SURVEY.md §2): declaration
  ``process_new_doc(..., uint16 term_idx_in_q, bool is_syn_recall, ...)``
  (src/table.cpp:421-424) vs call sites ``(..., false, i, ...)`` for
  original terms (src/table.cpp:371) and ``(..., true, i, ...)`` for
  synonyms (src/table.cpp:395). Effective semantics implemented by
  ``compat="reference"`` in _recall() below; ``compat="fixed"`` does the
  obviously-intended thing.
* hit_freq = min(tf_q, tf_d) (src/table.cpp:468); term_hits = Σ hit_freq
  (src/node_def.cpp:188-191).
* unsigned-wrap in F_QU_EXTRA: (query_len - overlap) is uint32 arithmetic
  (src/table.cpp:903) → wraps when overlap > query_len.
* BM25 constants per profile; reference hard-codes k1=2.0,k2=1.0,b=0.75
  (src/table.cpp:785-787); idf looked up by the **doc-side** term sign
  (src/table.cpp:760).
* final_score = vsm (cqr*ctr commented out, src/table.cpp:709); features
  only for the first min(n,200) candidates of the 1st sort
  (src/table.cpp:665-668); the rest keep final_score = 0 but stay in the
  final sort.
* the reference's sorts are unstable with no final tiebreak
  (src/table.cpp:404-414, 686-689); the golden model pins the canonical
  deterministic refinement: 1st sort (term_hits desc, recall_by_syn asc,
  doc_len asc, doc_sign asc), final (score desc, doc_sign asc).

All accumulation is float64 in canonical order (records in doc-side
term_sign ascending order) — the deterministic refinement of the
reference's float32 unordered-map iteration (SURVEY.md §4.5).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..config import BM25_PROFILES, QueryConfig, reference_idf
from ..hashing import term_sign
from ..tokenizer import Token, text_len, tokenize_with_stats

_FLT_EPS = 1.1920928955078125e-07  # std::numeric_limits<float>::epsilon()


@dataclass
class GDoc:
    doc_sign: int
    text: str
    tokens: list[Token]
    signs: list[int]  # per occurrence, aligned with tokens
    dups: list[int]  # 1-based occurrence counts, aligned
    term_map: dict[int, list]  # sign -> [tf, first_idx, offsets]
    doc_len: int
    wei: list[float] = field(default_factory=list)  # per occurrence
    vec_module: float = 0.0
    wei_sum: float = 0.0


class GoldenIndex:
    """Index build: tokenize → postings (tf per (doc,term)) → total-tf idf →
    per-occurrence doc weights → avg_doc_len. Mirrors Table::init
    (src/table.cpp:28-80) with the deferred batch idf/weight pass."""

    def __init__(self, stopwords: list[str] | None = None, mode: str = "code"):
        self.mode = mode
        self.stop_signs: set[int] = {term_sign(w) for w in (stopwords or [])}
        self.docs: dict[int, GDoc] = {}
        # term_sign -> [term_txt, term_len, ttf, {doc_signs}]
        self.inv: dict[int, list] = {}
        self.idf: dict[int, float] = {}
        self.avg_doc_len: float = 0.0

    def add_doc(self, doc_sign_: int, text: str) -> None:
        toks, dups, tmap = tokenize_with_stats(text, self.mode)
        if not toks:
            return  # _add_to_inv_table rejects empty docs (table.cpp:270)
        signs = [term_sign(t.term) for t in toks]
        # rebuild term_map keyed by sign (tokenize_with_stats already does)
        d = GDoc(doc_sign_, text, toks, signs, dups, tmap, text_len(toks))
        # overwrite semantics on duplicate key (table.cpp:264)
        self.docs[doc_sign_] = d
        # inverted: reverse iteration, doc inserted once per term with
        # tf = max dup (table.cpp:268-299)
        seen: set[int] = set()
        for i in range(len(toks) - 1, -1, -1):
            s = signs[i]
            if s in self.stop_signs or s in seen:
                continue
            seen.add(s)
            ent = self.inv.get(s)
            if ent is None:
                ent = [toks[i].term, toks[i].length, 0, set()]
                self.inv[s] = ent
            if doc_sign_ not in ent[3]:
                ent[3].add(doc_sign_)
                ent[2] += dups[i]

    def finalize(self) -> None:
        """Batch idf + doc weights + avg_doc_len (table.cpp:63-77,301-337)."""
        n = len(self.docs)
        self.idf = {s: reference_idf(ent[2], n) for s, ent in self.inv.items()}
        for d in self.docs.values():
            mod = 0.0
            ws = 0.0
            d.wei = [0.0] * len(d.signs)
            for i, s in enumerate(d.signs):
                if s in self.stop_signs:
                    continue
                w = self.idf.get(s, 0.0)
                d.wei[i] = w
                mod += w * w
                ws += w
            d.vec_module = math.sqrt(mod)
            d.wei_sum = ws
        self.avg_doc_len = (
            sum(d.doc_len for d in self.docs.values()) / n if n else 0.0
        )

    def get_idf(self, s: int) -> float:
        return self.idf.get(s, 0.0)

    # --- plain views for comparing against the Spark segment store ---

    def term_stats_rows(self) -> list[tuple]:
        """(term_sign, term, term_len, df, ttf, idf) sorted by sign."""
        return sorted(
            (s, e[0], e[1], len(e[3]), e[2], self.idf[s])
            for s, e in self.inv.items()
        )

    def postings_rows(self) -> dict[int, list[tuple[int, int]]]:
        """term_sign -> sorted [(doc_sign, tf)].

        tf comes from the doc's CURRENT (forward-table) term_map — for
        "ghost" postings left behind by a duplicate-url overwrite
        (table.cpp:264 vs 284-290) the term is absent there and the
        reference's operator[] default-insert yields tf=0 at match time
        (table.cpp:461); mirror that here."""
        out: dict[int, list[tuple[int, int]]] = {}
        for s, e in self.inv.items():
            lst = []
            for ds in e[3]:
                ent = self.docs[ds].term_map.get(s)
                lst.append((ds, ent[0] if ent else 0))
            out[s] = sorted(lst)
        return out

    def doc_stats_rows(self) -> list[tuple]:
        """(doc_sign, doc_len, n_terms, vec_module, wei_sum) sorted."""
        return sorted(
            (d.doc_sign, d.doc_len, len(d.tokens), d.vec_module, d.wei_sum)
            for d in self.docs.values()
        )


@dataclass
class GMatch:
    """MatchTermInfo (node_def.h:127-144)."""

    term_sign: int
    term_txt: str
    term_len: int
    idf: float
    is_stopword: bool
    is_syn_match: bool
    # in_query / in_doc GlobalTermInfo: (term_freq, term_idx, offsets)
    q_tf: int = 0
    q_idx: int = 0
    q_offsets: tuple = ()
    d_tf: int = 0
    d_idx: int = 0
    d_offsets: tuple = ()
    hit_freq: int = 0


@dataclass
class GResult:
    doc_sign: int
    recall_by_syn: bool
    matches: dict[int, GMatch] = field(default_factory=dict)
    term_hits: int = 0
    features: dict[str, float] = field(default_factory=dict)
    vsm: float = 0.0
    bm25: float = 0.0
    cqr: float = 0.0
    ctr: float = 0.0
    miss: float = 0.0
    extra: float = 0.0
    disorder: float = 0.0
    final_score: float = 0.0


def _fdiv(a: float, b: float) -> float:
    """C++ float division semantics: x/0 → ±inf, 0/0 → nan."""
    if b == 0.0:
        if a == 0.0:
            return float("nan")
        return math.inf if a > 0 else -math.inf
    return a / b


def _lcs(a, b) -> int:
    """longest_common_subsequence (include/math_util.h:262-282)."""
    la, lb = len(a), len(b)
    dp = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(1, la + 1):
        ai = a[i - 1]
        row, prev = dp[i], dp[i - 1]
        for j in range(1, lb + 1):
            row[j] = prev[j - 1] + 1 if ai == b[j - 1] else max(row[j - 1], prev[j])
    return dp[la][lb]


def _lcsubstr(a, b) -> int:
    """longest_continuous_substring (include/math_util.h:284-307) —
    returns -1 for empty inputs like the reference."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return -1
    best = -1
    prev = [0] * lb
    for i in range(la):
        cur = [0] * lb
        for j in range(lb):
            if a[i] == b[j]:
                cur[j] = (prev[j - 1] + 1) if (i >= 1 and j >= 1) else 1
            best = max(best, cur[j])
        prev = cur
    return best


def _edit_distance(a, b) -> int:
    """edit_distance (include/math_util.h:240-264) — standard Levenshtein."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ai = a[i - 1]
        for j in range(1, lb + 1):
            d = prev[j - 1] if ai == b[j - 1] else prev[j - 1] + 1
            cur[j] = min(d, prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[lb]


def _stddev(xs) -> float:
    """standard_variance (include/math_util.h:309-331); empty → 0."""
    if not xs:
        return 0.0
    m = sum(xs) / len(xs)
    return math.sqrt(sum((x - m) ** 2 for x in xs) / len(xs))


def _pair_sign(s1: int, s2: int) -> int:
    """(sign1&0xffffffff)<<32 | sign2&0xffffffff on unsigned size_t
    (src/table.cpp:992-1004); our signs are signed int64 → mask mod 2^64."""
    a = (s1 % (1 << 64)) & 0xFFFFFFFF
    b = (s2 % (1 << 64)) & 0xFFFFFFFF
    return (a << 32) | b


class GoldenQueryEngine:
    """Query pipeline: _fill_query_info → recall → 1st sort → features for
    top-200 → final sort → top-k (src/table.cpp:537-606)."""

    def __init__(
        self,
        index: GoldenIndex,
        synonyms: list[list[str]] | None = None,
        cfg: QueryConfig | None = None,
    ):
        self.ix = index
        self.cfg = cfg or QueryConfig()
        # term text -> cluster id; cluster id -> ordered term list
        self.syn_of: dict[str, int] = {}
        self.clusters: list[list[str]] = synonyms or []
        for cid, cluster in enumerate(self.clusters):
            for t in cluster:
                # first cluster wins (unordered_map::insert keeps existing;
                # src/synonyms.cpp:40-49 uses insert)
                self.syn_of.setdefault(t, cid)

    # -- C2: synonym expansion (src/synonyms.cpp:57-84) --
    def _get_syns(self, term: str) -> list[str]:
        cid = self.syn_of.get(term)
        if cid is None:
            return []
        out = []
        for cand in self.clusters[cid]:
            # keep iff len(term) <= len(cand) or cand ⊂ term (byte lengths)
            tb, cb = term.encode(), cand.encode()
            if len(tb) > len(cb) and term.find(cand) == -1:
                continue
            out.append(cand)
        return out

    def _fill_query_info(self, query: str):
        toks, dups, tmap = tokenize_with_stats(query, self.ix.mode)
        signs = [term_sign(t.term) for t in toks]
        mod = 0.0
        ws = 0.0
        wei = [0.0] * len(toks)
        for i in range(len(toks)):
            s = signs[i]
            if s in self.ix.stop_signs:
                continue
            w = self.ix.get_idf(s)
            wei[i] = w
            mod += w * w
            ws += w
        qlen = text_len(toks)
        syns = [self._get_syns(t.term) for t in toks]
        return {
            "query": query,
            "tokens": toks,
            "signs": signs,
            "dups": dups,
            "term_map": {k: [v[0], v[1], list(v[2])] for k, v in tmap.items()},
            "wei": wei,
            "vec_module": math.sqrt(mod),
            "wei_sum": ws,
            "query_len": qlen,
            "syns": syns,
        }

    # -- C3/C4: recall with compat semantics --
    def _recall(self, qi) -> list[GResult]:
        compat_ref = self.cfg.compat == "reference"
        res_map: dict[int, GResult] = {}

        def fill_match(term_s: int, doc: GDoc, is_syn_match: bool, in_q_idx_term: int | None) -> GMatch:
            """fill_match_term_info (src/table.cpp:443-471).

            in_q_idx_term: if is_syn_match, the query term index whose
            stats to inherit; else None → look up by term_s (with the
            default-insert side effect on the query term_map)."""
            ent = self.ix.inv.get(term_s)
            m = GMatch(
                term_sign=term_s,
                term_txt=ent[0] if ent else "",
                term_len=ent[1] if ent else 0,
                idf=self.ix.get_idf(term_s),
                is_stopword=term_s in self.ix.stop_signs,
                is_syn_match=is_syn_match,
            )
            if is_syn_match:
                ori_sign = qi["signs"][in_q_idx_term]
                g = qi["term_map"][ori_sign]
            else:
                g = qi["term_map"].get(term_s)
                if g is None:
                    # operator[] default-insert side effect (table.cpp:461)
                    g = [0, 0, []]
                    qi["term_map"][term_s] = g
            m.q_tf, m.q_idx, m.q_offsets = g[0], g[1], tuple(g[2])
            gd = doc.term_map.get(term_s)
            if gd is None:
                gd = [0, 0, []]
                doc.term_map[term_s] = gd
            m.d_tf, m.d_idx, m.d_offsets = gd[0], gd[1], tuple(gd[2])
            m.hit_freq = min(m.q_tf, m.d_tf)
            return m

        for i in range(len(qi["tokens"])):
            if qi["dups"][i] > 1:  # duplicate term skip (table.cpp:349-351)
                continue
            s = qi["signs"][i]
            ent = self.ix.inv.get(s)
            if ent is not None:
                for ds in sorted(ent[3]):  # pinned doc order (unordered in ref)
                    doc = self.ix.docs[ds]
                    r = res_map.get(ds)
                    if r is not None:
                        if s in r.matches:
                            continue
                        r.matches[s] = fill_match(s, doc, False, None)
                    else:
                        # process_new_doc with the arg-order bug:
                        # call (..., false, i, ...) → term_idx_in_q=0,
                        # is_syn_recall=(i != 0)    (table.cpp:371,421-424)
                        if compat_ref:
                            is_syn = i != 0
                            r = GResult(ds, recall_by_syn=is_syn)
                            m = fill_match(s, doc, is_syn, 0 if is_syn else None)
                        else:
                            r = GResult(ds, recall_by_syn=False)
                            m = fill_match(s, doc, False, None)
                        r.matches[s] = m
                        res_map[ds] = r
            # synonym recall (table.cpp:376-397)
            syn_list = qi["syns"][i]
            n_recalled = 0
            for syn in syn_list:
                if n_recalled >= self.cfg.max_syn_recall:
                    break
                n_recalled += 1  # loop bound is j < max (table.cpp:377)
                ss = term_sign(syn)
                if ss == s:
                    continue
                sent = self.ix.inv.get(ss)
                if sent is None:
                    continue
                for ds in sorted(sent[3]):
                    if ds in res_map:
                        continue  # both hit → ignore (table.cpp:388-393)
                    doc = self.ix.docs[ds]
                    # call (..., true, i, ...) → term_idx_in_q=1,
                    # is_syn_recall=(i != 0)    (table.cpp:395,421-424)
                    if compat_ref:
                        is_syn = i != 0
                        r = GResult(ds, recall_by_syn=is_syn)
                        m = fill_match(ss, doc, is_syn, 1 if is_syn else None)
                    else:
                        r = GResult(ds, recall_by_syn=True)
                        m = fill_match(ss, doc, True, i)
                    r.matches[ss] = m
                    res_map[ds] = r

        results = list(res_map.values())
        for r in results:
            r.term_hits = sum(m.hit_freq for m in r.matches.values())
            r.features["F_QU_HIT_TERM_CNT"] = float(r.term_hits)
        # 1st sort, pinned refinement of table.cpp:404-414
        results.sort(
            key=lambda r: (
                -r.term_hits,
                r.recall_by_syn,
                self.ix.docs[r.doc_sign].doc_len,
                r.doc_sign,
            )
        )
        return results

    # -- D1..D10 --
    def _calc_features(self, qi, r: GResult) -> None:
        doc = self.ix.docs[r.doc_sign]
        recs = [r.matches[s] for s in sorted(r.matches)]  # canonical order

        # D1 VSM (table.cpp:713-754)
        qmod, dmod = qi["vec_module"], doc.vec_module
        if abs(qmod) > _FLT_EPS and abs(dmod) > _FLT_EPS:
            wei_map: dict[int, list[float]] = {}
            for i, s in enumerate(qi["signs"]):
                if s in self.ix.stop_signs:
                    continue
                wei_map.setdefault(s, [qi["wei"][i], 0.0])
            for i, s in enumerate(doc.signs):
                if s in self.ix.stop_signs:
                    continue
                if s in wei_map:
                    wei_map[s][1] = doc.wei[i]
                else:
                    wei_map[s] = [0.0, doc.wei[i]]
            dot = sum(v[0] * v[1] for _, v in sorted(wei_map.items()))
            r.vsm = dot / (qmod * dmod)
        r.features["F_QU_VSM"] = r.vsm

        # D2 BM25 (table.cpp:756-794); idf by doc-side sign
        prof = BM25_PROFILES[self.cfg.profile]
        adl = self.ix.avg_doc_len
        bm25 = 0.0
        for m in recs:
            wi = self.ix.get_idf(m.term_sign)
            kd = prof.k1 * (1 - prof.b + prof.b * doc.doc_len / adl)
            left = m.d_tf * (prof.k1 + 1) / (m.d_tf + kd)
            right = m.q_tf * (prof.k2 + 1) / (m.q_tf + prof.k2)
            bm25 += wi * left * right
        r.bm25 = bm25
        r.features["F_QU_BM25"] = bm25

        # D3 CQR/CTR (table.cpp:796-837)
        divisor = sum(m.hit_freq * m.idf for m in recs if not m.is_stopword)
        r.cqr = _fdiv(divisor, qi["wei_sum"])
        r.ctr = _fdiv(divisor, doc.wei_sum)
        r.miss = 1 - r.cqr
        r.features["F_QU_TERM_WEI_CQR"] = r.cqr
        r.features["F_QU_TERM_WEI_CTR"] = r.ctr
        r.features["F_QU_TERM_WEI_COVERAGE"] = r.cqr * r.ctr
        r.features["F_QU_MISS"] = r.miss

        # D5 scatter overlap (table.cpp:881-918)
        overlap = sum(m.term_len * m.hit_freq for m in recs)
        qlen, dlen = qi["query_len"], doc.doc_len
        # uint32 wrap (table.cpp:903)
        extra = float((qlen - overlap) % (1 << 32)) / (qlen + 1)
        r.extra = extra
        r.features["F_QU_EXTRA"] = extra
        r.features["F_Q_LEN"] = float(qlen)
        r.features["F_U_LEN"] = float(dlen)
        r.features["F_QU_STR_LEN_CQR"] = _fdiv(float(overlap), qlen)
        r.features["F_QU_STR_LEN_CTR"] = _fdiv(float(overlap), dlen)
        r.features["F_QU_STR_LEN_COVERAGE"] = (
            r.features["F_QU_STR_LEN_CQR"] * r.features["F_QU_STR_LEN_CTR"]
        )
        nq, nd = len(qi["tokens"]), len(doc.tokens)
        r.features["F_Q_TERM_CNT"] = float(nq)
        r.features["F_U_TERM_CNT"] = float(nd)
        r.features["F_QU_TERM_CNT_CQR"] = _fdiv(float(r.term_hits), nq)
        r.features["F_QU_TERM_CNT_CTR"] = _fdiv(float(r.term_hits), nd)
        r.features["F_QU_TERM_CNT_COVERAGE"] = (
            r.features["F_QU_TERM_CNT_CQR"] * r.features["F_QU_TERM_CNT_CTR"]
        )

        # D4 order overlap (table.cpp:839-879): term granularity on sign
        # sequences, str granularity on BYTES (std::string indexing)
        qb, db = qi["query"].encode(), doc.text.encode()
        t_lcseq = _lcs(qi["signs"], doc.signs)
        t_lcstr = _lcsubstr(qi["signs"], doc.signs)
        s_lcseq = _lcs(qb, db)
        s_lcstr = _lcsubstr(qb, db)
        f = r.features
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

        # D6 edit distance (table.cpp:920-937); str norms over CHAR lens
        t_ed = _edit_distance(qi["signs"], doc.signs)
        s_ed = _edit_distance(qb, db)
        f["F_QU_TERM_EDIST"] = float(t_ed)
        f["F_QU_TERM_EDIST_OVER_Q"] = _fdiv(float(t_ed), nq)
        f["F_QU_TERM_EDIST_OVER_U"] = _fdiv(float(t_ed), nd)
        f["F_QU_STR_EDIST"] = float(s_ed)
        f["F_QU_STR_EDIST_OVER_Q"] = _fdiv(float(s_ed), qlen)
        f["F_QU_STR_EDIST_OVER_U"] = _fdiv(float(s_ed), dlen)

        # D7 disorder (table.cpp:939-990): only when >1 matched term
        if len(r.matches) > 1:
            qpairs: set[int] = set()
            qsigns = qi["signs"]
            for i in range(len(qsigns)):
                if qsigns[i] not in r.matches:
                    continue
                for j in range(i + 1, len(qsigns)):
                    if qsigns[j] not in r.matches:
                        continue
                    qpairs.add(_pair_sign(qsigns[i], qsigns[j]))
            order = disorder = 0
            dsigns = doc.signs
            for i in range(len(dsigns)):
                if dsigns[i] not in r.matches:
                    continue
                for j in range(i + 1, len(dsigns)):
                    if dsigns[j] not in r.matches:
                        continue
                    if _pair_sign(dsigns[i], dsigns[j]) in qpairs:
                        order += 1
                    if _pair_sign(dsigns[j], dsigns[i]) in qpairs:
                        disorder += 1
            r.disorder = disorder / (order + disorder + 1)
        f["F_QU_DISORDER"] = r.disorder

        # D8 diversity (table.cpp:1006-1021)
        q_off: list[int] = []
        d_off: list[int] = []
        for m in recs:
            q_off.extend(m.q_offsets)
            d_off.extend(m.d_offsets)
        f["F_QU_HIT_DIVERSITY"] = _stddev(d_off) - _stddev(q_off)

        # D9 proximity (table.cpp:707-708)
        f["F_QU_PROXIMITY"] = math.pow(0.9, r.miss + r.extra + r.disorder)

        # table.cpp:709 ships vsm; 'coverage' (cqr·ctr) is the README
        # V0.1 scorer; 'bm25' for the headline path — mirrors
        # features.compute_features_pdf's ranker switch
        ranker = getattr(self.cfg, "ranker", "vsm")
        if ranker == "coverage":
            r.final_score = r.features["F_QU_TERM_WEI_COVERAGE"]
        elif ranker == "bm25":
            r.final_score = r.bm25
        else:
            r.final_score = r.vsm

    def search(self, query: str, k: int | None = None) -> list[GResult]:
        """Full reference pipeline: final ranking by vsm (funnel mode)."""
        qi = self._fill_query_info(query)
        if not qi["tokens"]:
            return []
        results = self._recall(qi)
        for r in results[: self.cfg.max_2nd_sort]:
            if r.matches:  # _calc_features guards empty (table.cpp:695)
                self._calc_features(qi, r)
        results.sort(key=lambda r: (-r.final_score, r.doc_sign))
        return results[: k or self.cfg.k]

    def bm25_topk(self, query: str, k: int | None = None) -> list[GResult]:
        """BM25-ranked top-k over ALL recalled candidates (the north-rule
        headline path; no 200-candidate funnel gate)."""
        qi = self._fill_query_info(query)
        if not qi["tokens"]:
            return []
        results = self._recall(qi)
        prof = BM25_PROFILES[self.cfg.profile]
        adl = self.ix.avg_doc_len
        for r in results:
            doc = self.ix.docs[r.doc_sign]
            bm25 = 0.0
            for s in sorted(r.matches):
                m = r.matches[s]
                wi = self.ix.get_idf(m.term_sign)
                kd = prof.k1 * (1 - prof.b + prof.b * doc.doc_len / adl)
                left = m.d_tf * (prof.k1 + 1) / (m.d_tf + kd)
                right = m.q_tf * (prof.k2 + 1) / (m.q_tf + prof.k2)
                bm25 += wi * left * right
            r.bm25 = bm25
        results.sort(key=lambda r: (-r.bm25, r.doc_sign))
        return results[: k or self.cfg.k]
