"""Incremental cache upsert tests (J8 — reference
omim_txt_parser.py:516-585, including the overlap-day duplicate)."""

from omim_spark.cache import mims_to_fetch, pack_ids, unpack_packed_ids, upsert_cache


class TestUpsert:
    def test_new_wins_old_survives(self, spark):
        cached = spark.createDataFrame(
            [("100100", "old-a"), ("200200", "old-b")], ["mim", "val"]
        )
        fresh = spark.createDataFrame(
            [("100100", "new-a"), ("300300", "new-c")], ["mim", "val"]
        )
        merged = {r.mim: r.val for r in upsert_cache(cached, fresh).collect()}
        assert merged == {"100100": "new-a", "200200": "old-b", "300300": "new-c"}

    def test_idempotent(self, spark):
        cached = spark.createDataFrame([("1", "a")], ["mim", "val"])
        fresh = spark.createDataFrame([("1", "a")], ["mim", "val"])
        once = upsert_cache(cached, fresh)
        twice = upsert_cache(once, fresh)
        assert twice.count() == 1

    def test_mims_to_fetch(self, spark):
        all_mims = spark.createDataFrame([("1",), ("2",), ("3",)], ["mim_number"])
        cached = spark.createDataFrame([("2",)], ["mim"])
        out = sorted(r.mim_number for r in mims_to_fetch(all_mims, cached).collect())
        assert out == ["1", "3"]


class TestPackUnpack:
    def test_round_trip(self, spark):
        df = spark.createDataFrame(
            [("1", "111|222"), ("2", ""), ("3", "333")], ["mim", "pmid_refs"]
        )
        ids = unpack_packed_ids(df, "pmid_refs")
        assert sorted((r.mim, r.id) for r in ids.collect()) == [
            ("1", "111"),
            ("1", "222"),
            ("3", "333"),
        ]
        packed = {r.mim: r.out for r in pack_ids(ids, "mim", "id", "out").collect()}
        assert packed == {"1": "111|222", "3": "333"}
