"""Captioning metrics: BLEU, CIDEr, METEOR, BERTScore
(ref: captioning_evaluation.py:97-119).

The reference calls HuggingFace ``evaluate`` ("bleu", "meteor", "bertscore")
and pycocoevalcap's Cider. Those packages aren't in this image, so BLEU and
CIDEr are implemented natively with the same published algorithms
(Papineni et al. corpus BLEU; Vedantam et al. CIDEr with tf-idf 4-gram
cosine and length penalty). METEOR uses nltk when its wordnet data is
available; BERTScore needs a local BERT checkpoint — both degrade with a
clear warning instead of failing the pipeline.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Sequence


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def corpus_bleu(predictions: List[str], references: List[List[str]],
                max_order: int = 4, smooth: bool = False) -> Dict:
    """Papineni corpus BLEU — same algorithm as HF evaluate's "bleu"
    (which uses the tensorflow nmt compute_bleu)."""
    matches_by_order = [0] * max_order
    possible_by_order = [0] * max_order
    ref_length = trans_length = 0
    for pred, refs in zip(predictions, references):
        pred_tokens = pred.split()
        refs_tokens = [r.split() for r in refs]
        trans_length += len(pred_tokens)
        ref_length += min(len(r) for r in refs_tokens)
        merged_ref = Counter()
        for r in refs_tokens:
            for n in range(1, max_order + 1):
                for gram, cnt in _ngrams(r, n).items():
                    merged_ref[gram] = max(merged_ref[gram], cnt)
        for n in range(1, max_order + 1):
            overlap = {
                g: min(c, merged_ref[g])
                for g, c in _ngrams(pred_tokens, n).items() if g in merged_ref
            }
            matches_by_order[n - 1] += sum(overlap.values())
            possible_by_order[n - 1] += max(len(pred_tokens) - n + 1, 0)

    precisions = [0.0] * max_order
    for i in range(max_order):
        if smooth:
            precisions[i] = (matches_by_order[i] + 1.0) / (possible_by_order[i] + 1.0)
        elif possible_by_order[i] > 0:
            precisions[i] = matches_by_order[i] / possible_by_order[i]

    if min(precisions) > 0:
        geo_mean = math.exp(sum(math.log(p) for p in precisions) / max_order)
    else:
        geo_mean = 0.0
    ratio = trans_length / max(ref_length, 1)
    bp = 1.0 if ratio > 1.0 else math.exp(1 - 1 / ratio) if ratio > 0 else 0.0
    return {
        "bleu": geo_mean * bp,
        "precisions": precisions,
        "brevity_penalty": bp,
        "length_ratio": ratio,
        "translation_length": trans_length,
        "reference_length": ref_length,
    }


def cider_score(references: Dict[str, List[str]],
                candidates: Dict[str, List[str]],
                n: int = 4, sigma: float = 6.0):
    """CIDEr (Vedantam et al.) — pycocoevalcap Cider algorithm: per-n tf-idf
    vectors, length-penalized cosine, x10, averaged over n.
    references/candidates: {key: [sentences]} with one candidate per key."""
    import numpy as np

    keys = sorted(candidates.keys())

    def counts(sent: str, order: int) -> Counter:
        return _ngrams(sent.lower().split(), order)

    # document frequency over reference sets
    doc_freq = [defaultdict(float) for _ in range(n)]
    for k in keys:
        for order in range(n):
            grams = set()
            for ref in references[k]:
                grams |= set(counts(ref, order + 1).keys())
            for g in grams:
                doc_freq[order][g] += 1
    log_n_docs = math.log(max(len(keys), 1))

    def tfidf_vec(sent: str, order: int):
        cnt = counts(sent, order + 1)
        length = max(len(sent.lower().split()), 1)
        vec = {}
        norm = 0.0
        for g, c in cnt.items():
            df = math.log(max(doc_freq[order][g], 1.0))
            w = (c / 1.0) * max(log_n_docs - df, 0.0)
            vec[g] = w
            norm += w * w
        return vec, math.sqrt(norm), length

    scores = []
    for k in keys:
        cand = candidates[k][0]
        score_n = np.zeros(n)
        for order in range(n):
            cv, cn, cl = tfidf_vec(cand, order)
            acc = 0.0
            for ref in references[k]:
                rv, rn, rl = tfidf_vec(ref, order)
                num = sum(min(cv[g], rv.get(g, 0.0)) * rv.get(g, 0.0)
                          for g in cv)
                if cn > 0 and rn > 0:
                    sim = num / (cn * rn)
                else:
                    sim = 0.0
                delta = cl - rl
                sim *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
                acc += sim
            score_n[order] = acc / max(len(references[k]), 1)
        scores.append(float(np.mean(score_n) * 10.0))
    return float(np.mean(scores)), np.asarray(scores)


def meteor_score_safe(predictions: List[str], references: List[List[str]]):
    """METEOR via nltk (what HF evaluate wraps); returns None when the
    wordnet corpus isn't available in this offline image."""
    try:
        import nltk
        from nltk.translate.meteor_score import meteor_score

        try:
            nltk.data.find("corpora/wordnet.zip")
        except LookupError:
            try:
                nltk.data.find("corpora/wordnet")
            except LookupError:
                return None
        scores = [
            meteor_score([r.split() for r in refs], pred.split())
            for pred, refs in zip(predictions, references)
        ]
        return sum(scores) / max(len(scores), 1)
    except Exception:
        return None


def bertscore_safe(predictions: List[str], references: List[List[str]],
                   model_path: str | None = None):
    """BERTScore precision mean (ref: captioning_evaluation.py:98-100).
    Requires a LOCAL HF encoder checkpoint (zero-egress image); returns
    None when unavailable."""
    if not model_path:
        return None
    try:
        import numpy as np
        import torch
        from transformers import AutoModel, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_path)
        model = AutoModel.from_pretrained(model_path).eval()

        def embed(sents):
            with torch.no_grad():
                enc = tok(sents, return_tensors="pt", padding=True,
                          truncation=True)
                out = model(**enc).last_hidden_state
                mask = enc["attention_mask"].unsqueeze(-1)
                return out, mask

        precisions = []
        for pred, refs in zip(predictions, references):
            p_emb, p_mask = embed([pred])
            r_emb, r_mask = embed(refs)
            p = torch.nn.functional.normalize(p_emb[0], dim=-1)
            best = -1.0
            for ri in range(r_emb.shape[0]):
                r = torch.nn.functional.normalize(
                    r_emb[ri][: int(r_mask[ri].sum())], dim=-1)
                sim = p[: int(p_mask[0].sum())] @ r.T
                prec = float(sim.max(dim=1).values.mean())
                best = max(best, prec)
            precisions.append(best)
        return float(np.mean(precisions))
    except Exception as e:  # pragma: no cover
        print(f"bertscore unavailable: {e}")
        return None
