"""Fault injection: SIGKILL the training CLI mid-run, then resume with
--continue_train (SURVEY.md section 5, failure-detection row: crash =
resubmit + resume; our checkpoints are strictly richer than the reference's,
carrying optimizer state + step + pools)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

ARGS = [
    "--model", "pix2pix", "--dataset_mode", "synthetic", "--netG", "unet_d4",
    "--crop_size", "32", "--input_nc", "1", "--output_nc", "1",
    "--batch_size", "2", "--ngf", "8", "--ndf", "8", "--norm", "instance",
    "--synthetic_samples", "8", "--print_freq", "2", "--save_epoch_freq", "1",
    "--name", "faulty",
]

ENV = dict(
    os.environ,
    BIASGAN_PLATFORM="cpu",  # sitecustomize overrides JAX_PLATFORMS; CLIs honor this
    XLA_FLAGS="--xla_force_host_platform_device_count=1",
)


def _run(tmp, extra, timeout=420, kill_after=None):
    cmd = [sys.executable, "-u", "train.py"] + ARGS + [
        "--checkpoints_dir", str(tmp)
    ] + extra
    p = subprocess.Popen(
        cmd, cwd=os.path.join(os.path.dirname(__file__), "..", ".."),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=ENV,
    )
    if kill_after is None:
        out, _ = p.communicate(timeout=timeout)
        return p.returncode, out
    # wait until the first epoch checkpoint exists, then SIGKILL mid-run
    ckpt = tmp / "faulty" / "ckpt" / "epoch_1"
    deadline = time.time() + timeout
    while time.time() < deadline:
        if ckpt.is_dir():
            break
        if p.poll() is not None:
            out, _ = p.communicate()
            raise AssertionError(f"train exited before checkpoint:\n{out[-2000:]}")
        time.sleep(0.2)
    else:
        p.kill()
        raise AssertionError("no checkpoint appeared before deadline")
    time.sleep(kill_after)
    p.send_signal(signal.SIGKILL)
    p.wait()
    return -9, ""


@pytest.mark.slow
def test_kill_and_resume(tmp_path):
    # phase 1: a long run (it will never finish) killed shortly after the
    # epoch-1 checkpoint lands
    from biasgan_tpu.utils import checkpoint as ckpt

    _run(tmp_path, ["--n_epochs", "500", "--n_epochs_decay", "0"],
         kill_after=0.5)
    run_dir = str(tmp_path / "faulty")
    # the kill may land anywhere in the overwrite sequence; the library's
    # crash-fallback resolution ('latest' -> 'latest.old') must always find
    # a committed checkpoint + its paired meta
    assert ckpt.has_checkpoint(run_dir, "latest")
    killed_meta = ckpt.load_meta(run_dir, "latest")
    killed_at = killed_meta.get("epoch", 1)
    assert killed_at >= 1

    # phase 2: resume from 'latest' and run to a nearby finish line
    horizon = killed_at + 1
    rc, out = _run(
        tmp_path,
        ["--n_epochs", str(horizon), "--n_epochs_decay", "0",
         "--continue_train", "--epoch_count", str(killed_at)],
    )
    assert rc == 0, out[-2000:]
    assert f"End of epoch {horizon} / {horizon}" in out
    resumed = ckpt.load_meta(run_dir, "latest")
    assert resumed["epoch"] > killed_at, (resumed, killed_at)
    assert (tmp_path / "faulty" / "ckpt" / f"epoch_{horizon}").is_dir()
