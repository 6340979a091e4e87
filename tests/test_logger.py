"""CSV schema self-healing in the logger (reference: tools/logger.py:59-116).

The reference rewrites train.csv whenever the field set changes; the failure
mode covered here is a metric appearing MID-RUN (episode_reward only exists
after the first episode completes), which must widen the schema in place
rather than crash the csv.DictWriter.
"""

import csv

from genrl_tpu.utils.logger import Logger


def _read(path):
    with path.open() as f:
        return list(csv.DictReader(f))


def test_field_added_mid_run_widens_schema(tmp_path):
    lg = Logger(tmp_path)
    with lg.log_and_dump_ctx(500, "train") as log:
        log("fps", 10.0)
        log("step", 500)
    with lg.log_and_dump_ctx(1000, "train") as log:
        log("fps", 12.0)
        log("step", 1000)
        log("episode_reward", 33.5)  # new field: first episode just ended
    rows = _read(tmp_path / "train.csv")
    assert len(rows) == 2
    assert float(rows[0]["episode_reward"]) == 0.0  # backfilled
    assert float(rows[1]["episode_reward"]) == 33.5
    assert float(rows[1]["fps"]) == 12.0


def test_field_subset_appends_with_restval(tmp_path):
    lg = Logger(tmp_path)
    with lg.log_and_dump_ctx(100, "train") as log:
        log("fps", 1.0)
        log("episode_reward", 5.0)
    with lg.log_and_dump_ctx(200, "train") as log:
        log("fps", 2.0)  # no episode this window
    rows = _read(tmp_path / "train.csv")
    assert len(rows) == 2
    assert float(rows[1]["episode_reward"]) == 0.0


def test_resume_truncates_overwritten_frames(tmp_path):
    lg = Logger(tmp_path)
    for frame in (100, 200, 300):
        with lg.log_and_dump_ctx(frame, "train") as log:
            log("fps", float(frame))
    # simulate restart-and-resume from frame 200 with a different field set
    lg2 = Logger(tmp_path)
    with lg2.log_and_dump_ctx(200, "train") as log:
        log("fps", 42.0)
        log("loss", 1.5)
    rows = _read(tmp_path / "train.csv")
    assert [float(r["frame"]) for r in rows] == [100.0, 200.0]
    assert float(rows[1]["fps"]) == 42.0
    assert float(rows[0]["loss"]) == 0.0
