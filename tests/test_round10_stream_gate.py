"""Round-10 ADVICE pin: the shared five-maintainer stream's state cache
must not serve PARTIAL state.

streaming._update_one commits each maintainer's _current.json pointer
atomically PER BATCH, so a stream that dies (or is stopped) after its
first batch commit leaves every pointer file present — an existence-only
cache validation would happily serve the committed prefix as final state.
Reuse is therefore gated on a completion promotion that happens only
after awaitTermination succeeds; an unpromoted entry is reclaimed and
rebuilt on the next call.
"""

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_unpromoted_shared_state_is_rebuilt_not_served(spark):
    from aircan_spark.ext import queries_w46 as w46

    dirs = w46._shared_sketch_states(spark, SF_DIR)
    assert SF_DIR in w46._SHARED_STATE_COMPLETE
    # simulate a mid-run death after the first batch commit: every pointer
    # file exists (atomic per-batch commits) but completion never happened
    w46._SHARED_STATE_COMPLETE.discard(SF_DIR)
    for d in dirs.values():
        assert os.path.exists(os.path.join(d, "_current.json"))  # the trap
    again = w46._shared_sketch_states(spark, SF_DIR)
    assert set(again) == set(dirs)
    assert all(again[n] != dirs[n] for n in dirs), (
        "cache served unpromoted (possibly partial) state dirs"
    )
    assert SF_DIR in w46._SHARED_STATE_COMPLETE
    # the suspect dirs were reclaimed, not leaked
    assert all(not os.path.exists(d) for d in dirs.values())
    # and a promoted entry IS served (no rebuild storm)
    assert w46._shared_sketch_states(spark, SF_DIR) is again
