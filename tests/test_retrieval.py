

def test_copurchase_rec_eval_toy(spark):
    from rat_strain_loader_pipeline_spark.operators.retrieval import (
        copurchase_rec_eval,
    )

    # train baskets: {A,B} x3 (strong A~B), {A,C} x1 (below support 2).
    rows = []
    for b in range(3):
        rows += [(b, 100 + b, "A", True), (b, 100 + b, "B", True)]
    rows += [(3, 103, "A", True), (3, 103, "C", True)]
    # test: user 100 later buys B?? no — owns A,B already. Give user
    # 104 train {A} and test {B}: rec for 104 = B (from A~B cnt 3) -> hit.
    rows += [(4, 104, "A", True), (5, 104, "B", False)]
    # user 105: train {C}, test {A}: C's only pair A has cnt 1 < 2 -> no recs.
    rows += [(6, 105, "C", True), (7, 105, "A", False)]
    df = spark.createDataFrame(
        rows, "basket_id long, cust_id long, item string, is_train boolean"
    )
    r = copurchase_rec_eval(df, k=2, min_support=2).collect()[0]
    # eval users: 104 and 105 (both have train+test items)
    assert r["n_users"] == 2
    assert r["n_hit_users"] == 1 and r["hitrate_q"] == 500_000
    # 104 gets exactly one rec (B); 105 none
    assert r["n_recs"] == 1 and r["n_hits"] == 1
    assert r["precision_q"] == 1_000_000
