"""nDCG retrieval audit (X259): perfect retrieval = 1.0, order matters
even with identical hit sets, empty-ANN query scores 0, negative gains
clamp."""

import math


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, cand_id long, cos_sim double, rank int"
    )


def test_ndcg_perfect_order_and_misorder(spark):
    from corpusama_spark.operators.similarity import ndcg_audit

    ideal = _df(
        spark,
        [(0, 10, 0.9, 1), (0, 11, 0.5, 2), (0, 12, 0.1, 3)],
    )
    # same hit set, identical order -> ndcg 1.0 (recall@k would also be
    # 1.0 for the swapped order below; nDCG tells them apart)
    assert ndcg_audit(ideal, ideal, k=3).first().ndcg_at_3 == 1.0

    swapped = _df(
        spark,
        [(0, 11, 0.5, 1), (0, 10, 0.9, 2), (0, 12, 0.1, 3)],
    )
    r = ndcg_audit(swapped, ideal, k=3).first()
    idcg = round(0.9 / math.log2(2) + 0.5 / math.log2(3) + 0.1 / math.log2(4), 6)
    dcg = round(0.5 / math.log2(2) + 0.9 / math.log2(3) + 0.1 / math.log2(4), 6)
    assert abs(r.idcg - idcg) < 1e-9 and abs(r.dcg - dcg) < 1e-9
    assert 0 < r.ndcg_at_3 < 1.0
    assert abs(r.ndcg_at_3 - round(dcg / idcg, 6)) < 1e-9


def test_missing_query_and_negative_clamp(spark):
    from corpusama_spark.operators.similarity import ndcg_audit

    ideal = _df(spark, [(0, 1, 0.8, 1), (1, 2, 0.7, 1)])
    approx = _df(spark, [(0, 3, -0.4, 1)])  # query 1 found nothing
    got = {r.query_id: r for r in ndcg_audit(approx, ideal, k=5).collect()}
    assert set(got) == {0, 1}
    assert got[1].dcg == 0.0 and got[1].ndcg_at_5 == 0.0
    # negative cosine contributes zero gain, not a negative DCG
    assert got[0].dcg == 0.0 and got[0].ndcg_at_5 == 0.0
