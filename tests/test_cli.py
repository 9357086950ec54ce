"""End-to-end CLI drives on the synthetic corpus (small models, CPU)."""

import os

import pytest

from asr_dfcnn_transformer_tpu.train import cli


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cliwork"))


def test_cli_am_train(workdir):
    cli.main(["am", "--workdir", workdir, "--synthetic", "16", "--small",
              "--epochs", "1", "--batch-size", "8", "--lr", "1e-3"])
    assert os.path.exists(os.path.join(workdir, "am_metrics.jsonl"))
    assert os.path.isdir(os.path.join(workdir, "ckpt_am"))


def test_cli_lm_train(workdir):
    cli.main(["lm", "--workdir", workdir, "--synthetic", "16", "--small",
              "--epochs", "1", "--batch-size", "8", "--lr", "1e-3"])
    assert os.path.exists(os.path.join(workdir, "lm_metrics.jsonl"))


def test_cli_eval(workdir):
    cli.main(["eval", "--workdir", workdir, "--synthetic", "16", "--small",
              "--batch-size", "8"])
    assert os.path.exists(os.path.join(workdir, "pred", "pred_log"))


def test_cli_infer(workdir, capsys):
    wav = os.path.join(workdir, "synthetic", "wav", "test", "utt_0.wav")
    cli.main(["infer", "--workdir", workdir, "--synthetic", "16", "--small",
              "--batch-size", "8", "--wav", wav])
    out = capsys.readouterr().out
    assert "拼音:" in out and "汉字:" in out


def test_cli_atten_train(workdir):
    cli.main(["atten", "--workdir", workdir, "--synthetic", "16", "--small",
              "--epochs", "1", "--batch-size", "8", "--lr", "1e-3"])
    assert os.path.exists(os.path.join(workdir, "atten_metrics.jsonl"))


def test_cli_e2e_train(workdir):
    cli.main(["e2e", "--workdir", workdir, "--synthetic", "16", "--small",
              "--epochs", "1", "--batch-size", "8", "--lr", "1e-3"])
    assert os.path.exists(os.path.join(workdir, "e2e_metrics.jsonl"))


def test_cli_joint_train(workdir):
    cli.main(["joint", "--workdir", workdir, "--synthetic", "16", "--small",
              "--epochs", "1", "--batch-size", "8", "--lr", "1e-3"])
    assert os.path.exists(os.path.join(workdir, "joint_metrics.jsonl"))


def test_cli_eval_lm(workdir, capsys):
    cli.main(["eval-lm", "--workdir", workdir, "--synthetic", "16",
              "--small", "--batch-size", "8"])
    out = capsys.readouterr().out
    assert "汉字 word accuracy ratio" in out
    assert os.path.exists(os.path.join(workdir, "pred", "pred_lm_log"))


def test_cli_eval_e2e(workdir, capsys):
    # requires the e2e checkpoint from test_cli_e2e_train (same workdir)
    cli.main(["eval-e2e", "--workdir", workdir, "--synthetic", "16",
              "--small", "--batch-size", "8"])
    out = capsys.readouterr().out
    assert "e2e 汉字 word accuracy ratio" in out
