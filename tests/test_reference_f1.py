"""The keep/drop F1 gate: Spark plan vs a SEQUENTIAL pure-Python oracle.

The oracle re-implements the decision chain row-at-a-time the way the
reference executes (pandas/loops, corpusama/corpus/langid.py +
export.py), using the REFERENCE'S OWN uninorm module for normalization
(loaded from /root/reference, never copied) and the engine's model kernels
for the model stages (they ARE the reference-semantics implementations,
independently pinned by tests/test_langid.py and tests/test_normalize.py).

This is the reference's own "parallel ≡ serial equivalence" test pattern
(test/test_util/test_parallel.py:39-58) scaled to the whole pipeline:
distribution, shuffles, joins, NULL paths, and rule ordering in the Spark
plan must reproduce the sequential decisions at F1 ≥ 0.99 (expected: 1.0).
"""

import re

import numpy as np
import pandas as pd

from corpusama_spark.functions.langid import analyze_lines, load_model
from corpusama_spark.functions.perplexity import get_model
from corpusama_spark.functions.scrub import scrub_caption_py
from corpusama_spark.functions.textrules import _DROP_TABLE, NAN_STRINGS
from corpusama_spark.io.imagecodec import decode_image, encode_png, encode_qimg, psnr
from corpusama_spark.pipeline import FilterConfig, run_pipeline
from corpusama_spark.sources.synth import captions_df

NANLIKE_RE = re.compile(r"(?i)^(" + "|".join(NAN_STRINGS) + r")?$")


def oracle_decide(row, uninorm, config: FilterConfig):
    """Sequential reference-semantics decision for one captions row."""
    caption = row["caption"]
    # P7/P9 nan-like
    if caption is None or NANLIKE_RE.match(caption.strip()):
        return False, "caption_missing"
    # F1-F9 normalization — the reference's own uninorm, line by line
    segs = [uninorm.normalize_line(line) for line in caption.split("\n")]
    caption_norm = "".join(segs)
    # clean_lines (util/langid.py:82-103)
    lines = []
    for seg in segs:
        x = seg.translate(_DROP_TABLE)
        if x.strip():
            x = " ".join(x.split())
            lines.append(x.lower() if x.isupper() else x)
    lid = analyze_lines(
        lines, load_model(), config.min_len, config.threshold, config.max_langs
    )
    if lid is None or not lid[0]:
        return False, "caption_empty_norm"
    entries, l1, _l1_size, _multiling = lid
    collapsed = " ".join(caption_norm.split())
    if len(collapsed) < config.min_caption_chars:
        return False, "caption_too_short"
    if len(collapsed.split()) < config.min_tokens:
        return False, "too_few_tokens"
    # image verify (S8 slot): decode, re-encode, PSNR >= 40
    data, fmt, w, h = row["bytes"], row["fmt"], row["w"], row["h"]
    if data is None:
        return False, "image_missing"
    try:
        arr = decode_image(bytes(data), fmt)
    except ValueError:
        return False, "image_corrupt"
    if arr.shape[0] != h or arr.shape[1] != w:
        return False, "image_dims_mismatch"
    rt = decode_image(
        encode_png(arr) if fmt == "png" else encode_qimg(arr, fmt), fmt
    )
    db = psnr(arr, rt)
    if not np.isinf(db) and db < 40.0:
        return False, "image_psnr_below_40db"
    # language rule (P3 / export.py:77 family)
    if config.target_lang:
        share = dict(entries).get(config.target_lang)
        if share is None or share < config.min_portion:
            return False, "lang_share"
    elif l1 is None or l1 in ("unknown", "short"):
        return False, "lang_share"
    # perplexity gate (M4 slot)
    ppl = get_model().perplexity_batch(pd.Series([caption_norm]))[0]
    if ppl > config.ppl_threshold:
        return False, "perplexity"
    return True, None


def test_keep_drop_f1_vs_sequential_oracle(spark, uninorm_ref):
    config = FilterConfig()
    n = 600
    rows = {r["image_id"]: r.asDict() for r in captions_df(spark, n).collect()}
    decided = {
        r["image_id"]: (r["keep"], r["drop_reason"], r["caption_scrubbed"])
        for r in run_pipeline(captions_df(spark, n), config).collect()
    }
    assert set(rows) == set(decided)

    tp = fp = fn = tn = 0
    mismatches = []
    for image_id, row in rows.items():
        want_keep, want_reason = oracle_decide(row, uninorm_ref, config)
        got_keep, got_reason, got_scrub = decided[image_id]
        if want_keep and got_keep:
            tp += 1
        elif want_keep and not got_keep:
            fn += 1
        elif not want_keep and got_keep:
            fp += 1
        else:
            tn += 1
        if want_keep != got_keep or want_reason != got_reason:
            mismatches.append((image_id, want_reason, got_reason))
        # scrubbed-caption equality for kept rows (north_rule)
        if got_keep:
            segs = [
                uninorm_ref.normalize_line(line)
                for line in row["caption"].split("\n")
            ]
            assert got_scrub == scrub_caption_py("".join(segs))
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (f1, mismatches[:5])
    # drop reasons must agree exactly, not just the boolean
    assert not mismatches, mismatches[:5]
