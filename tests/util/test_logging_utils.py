"""Runtime tracker + logger configuration unit tests.

reference: tests/util/test_runtime_tracker.py.
"""

import logging

from artist_tpu.util.logging_utils import (
    set_logger_config,
    set_runtime_logger,
    track_runtime,
)


def test_track_runtime_logs_start_finish_and_duration(tmp_path, caplog):
    set_runtime_logger(tmp_path / "runtime_log.txt")

    @track_runtime
    def work(x):
        return x * 2

    assert work(21) == 42
    contents = (tmp_path / "runtime_log.txt").read_text()
    assert "started:" in contents
    assert "finished:" in contents
    assert "duration_s=" in contents
    assert "work" in contents


def test_set_logger_config_formats_with_process_index(tmp_path):
    log_file = tmp_path / "artist.log"
    set_logger_config(level=logging.INFO, log_file=log_file, process_index=3)
    logging.getLogger("artist_tpu.test").info("hello from the test")
    contents = log_file.read_text()
    assert "[p3]" in contents
    assert "hello from the test" in contents
    # Restore the default configuration for other tests.
    set_logger_config()
