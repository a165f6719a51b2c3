"""CLI exposure of the parallelism strategies (--parallel_mode):
dp (shard_map DDP-faithful), gspmd (DPxTP channel sharding), spatial
(DPxSP height sharding) — each end-to-end on the 8-virtual-device mesh."""

import re

import pytest


def _run(tmp_path, mode, tag, extra=()):
    from discogan_modernized_tpu.cli.distributed_image_translation import main

    return main([
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        "--batch_size=8", "--epochs=1", "--distributed",
        f"--parallel_mode={mode}", "--world_size=8", "--log_interval=8",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/r_{tag}", f"--models_dir={tmp_path}/m_{tag}",
        "--precision=f32", *extra,
    ])


@pytest.mark.slow
@pytest.mark.parametrize("mode,extra", [
    ("gspmd", ("--tp=2",)),
    ("spatial", ("--tp=2",)),
])
def test_parallel_mode_cli_end_to_end(tmp_path, mode, extra):
    result_path, model_path = _run(tmp_path, mode, mode, extra)
    log = (result_path / "training_log.txt").read_text()
    lines = re.findall(r"Iter \[\d+/32\] GEN: \d+\.\d{4}/\d+\.\d{4}, "
                       r"FM: \d+\.\d{4}/\d+\.\d{4}, "
                       r"RECON: \d+\.\d{4}/\d+\.\d{4}, "
                       r"DIS: \d+\.\d{4}/\d+\.\d{4}", log)
    assert len(lines) >= 4  # iters 0,8,16,24 at log_interval=8
    for name in ("gen_A", "gen_B", "dis_A", "dis_B"):
        assert (model_path / f"{name}_final.pth").exists()


def test_parallel_mode_rejects_bad_tp(tmp_path):
    with pytest.raises(SystemExit, match="does not divide"):
        _run(tmp_path, "gspmd", "bad", ("--tp=3",))


def test_parallel_mode_rejects_unknown(tmp_path):
    from discogan_modernized_tpu.cli.distributed_image_translation import main

    with pytest.raises(SystemExit):
        main(["--task_name=synthetic", "--distributed",
              "--parallel_mode=nonsense",
              f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m"])
