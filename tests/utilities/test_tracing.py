"""Tracing/logging subsystem."""

import logging

from mdproptools_tpu.utilities.tracing import enable_logging, logger, stage


def test_stage_logs_at_debug(caplog):
    logger.setLevel(logging.DEBUG)
    with caplog.at_level(logging.DEBUG, logger="mdproptools_tpu"):
        with stage("unit-test-stage", frames=3):
            pass
    assert any("unit-test-stage" in r.message and "frames=3" in r.message
               for r in caplog.records)


def test_rdf_emits_stage_logs(mg_tfsi_dme_dir, caplog, tmp_path):
    import os

    from mdproptools_tpu.structural.rdf_cn import calc_atomic_rdf

    logger.setLevel(logging.DEBUG)
    with caplog.at_level(logging.DEBUG, logger="mdproptools_tpu"):
        calc_atomic_rdf(
            4.0, 0.1, 9,
            [16, 12.01, 1.008, 14.01, 32.06, 16, 12.01, 19, 24.305],
            [[8], [9]],
            os.path.join(mg_tfsi_dme_dir, "dump.nvt.0.dump"),
            save_mode=False, precision="strict",
        )
    assert any("frame_block" in r.message for r in caplog.records)
