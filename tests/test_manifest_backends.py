"""ManifestTable over the LogStore interface: the same transactional
scenarios run against BOTH backends — the local-FS store (hard-link
put-if-absent) and the in-memory object-store fake (conditional-PUT
contract: If-None-Match semantics, prefix list, LastModified)."""

import json

import pytest

from wallaroo_spark.sinks.manifest import (
    InMemoryLogStore,
    LocalFSLogStore,
    ManifestTable,
)


@pytest.fixture(params=["localfs", "inmemory"])
def make_table(request, tmp_path):
    def factory(name="t", **kw):
        base = str(tmp_path / name)
        if request.param == "localfs":
            return ManifestTable(base, **kw)
        return ManifestTable(base, log_store=InMemoryLogStore(), **kw)

    return factory


def test_append_read_time_travel(spark, make_table, tmp_path):
    t = make_table()
    t.append(spark.range(5).toDF("v"))
    t.append(spark.range(5, 8).toDF("v"))
    assert t.read(spark).count() == 8
    assert t.read(spark, version=0).count() == 5


def test_commit_race_retries_on_top_of_winner(spark, make_table):
    """A racer taking the next version through the STORE (the backend-
    agnostic way to lose the race) must push the commit to v+1 with both
    entries visible."""
    t = make_table()
    t.append(spark.range(3).toDF("v"))  # v0
    # racer grabs v1 directly via put-if-absent with no adds
    won = t.store.put_if_absent(
        "_log/1.json", json.dumps({"version": 1, "adds": [], "removes": []})
    )
    assert won
    v = t.append(spark.range(3, 7).toDF("v"))
    assert v == 2  # lost v1, retried on top
    assert t.read(spark).count() == 7


def test_overwrite_race_last_writer_wins(spark, make_table):
    """removes is re-evaluated on retry: the overwrite that loses the
    version race must also remove the racer's files — never a merge."""
    t = make_table()
    t.append(spark.range(10).toDF("v"))  # v0
    racer_files = t._write_parts(spark.range(100, 120).toDF("v"))
    orig_commit = t.store.put_if_absent
    fired = {"done": False}

    def inject(key, data):
        # before the overwrite's first attempt lands, the racer appends
        if not fired["done"] and key == "_log/1.json":
            fired["done"] = True
            orig_commit(
                "_log/1.json",
                json.dumps({"version": 1, "adds": racer_files, "removes": []}),
            )
        return orig_commit(key, data)

    t.store.put_if_absent = inject
    t.overwrite(spark.range(50, 55).toDF("v"))
    t.store.put_if_absent = orig_commit
    rows = sorted(r.v for r in t.read(spark).collect())
    assert rows == list(range(50, 55))  # racer's 100..119 removed, not merged


def test_checkpoint_expire_and_gap_error(spark, make_table):
    t = make_table(checkpoint_interval=None)
    for i in range(4):
        t.append(spark.range(i * 2, i * 2 + 2).toDF("v"))
    t.checkpoint()  # at v3
    assert t.expire_log() == 4  # v0..v3 expired (all at/below checkpoint)
    assert t.read(spark).count() == 8  # checkpoint-seeded replay intact
    with pytest.raises(ValueError, match="expired"):
        t.snapshot_files(version=1)  # below the horizon: refuse, not stale


def test_expire_by_age_inmemory_mtimes(spark, make_table):
    t = make_table()
    for i in range(3):
        t.append(spark.range(i, i + 1).toDF("v"))
    t.checkpoint()
    # age v0/v1 (backend-specific clock poke; contiguity rule is the SUT)
    if isinstance(t.store, InMemoryLogStore):
        t.store._mtimes["_log/0.json"] -= 10_000
        t.store._mtimes["_log/1.json"] -= 10_000
    else:
        import os
        import time

        for v in (0, 1):
            old = time.time() - 10_000
            os.utime(os.path.join(t._log, f"{v}.json"), (old, old))
    assert t.expire_log_by_age(min_age_s=5_000) == 2
    assert t.versions() == [2]
    assert t.read(spark).count() == 3


def test_put_if_absent_contract(make_table):
    t = make_table()
    assert t.store.put_if_absent("_log/9.json", "{}") is True
    assert t.store.put_if_absent("_log/9.json", "{...}") is False
    assert t.store.read("_log/9.json") == "{}"
    assert "9.json" in t.store.list("_log")
    t.store.delete("_log/9.json")
    assert "9.json" not in t.store.list("_log")
