"""Sweep runner (utils/sweep.py — the reference's cuda1.sh role)."""
import json

from shiftedscalequantization_tpu.utils import sweep


class TestGridParse:
    def test_comma_and_semicolon_values(self):
        assert sweep.parse_grid("lmda=0.01,0.1") == ("lmda", ["0.01", "0.1"])
        k, vs = sweep.parse_grid("shift_targets=0.5,1.0;0.25,1.0")
        assert k == "shift_targets" and vs == ["0.5,1.0", "0.25,1.0"]


class TestResume:
    def test_skips_completed_combos_and_logs_jsonl(self, tmp_path,
                                                   monkeypatch):
        calls = []

        def fake_cli(argv):
            calls.append(list(argv))
            if "--lmda" in argv and argv[argv.index("--lmda") + 1] == "9":
                raise RuntimeError("boom")
            return {"top1": 42.0}

        monkeypatch.setattr("shiftedscalequantization_tpu.cli.main",
                            fake_cli)
        out = tmp_path / "sweep.jsonl"
        res = sweep.main(["--base", "--dataset cifar10",
                          "--grid", "lmda=1,2,9", "--out", str(out)])
        assert len(res) == 3 and len(calls) == 3
        recs = [json.loads(line) for line in out.read_text().splitlines()]
        assert [r["combo"] for r in recs] == ["lmda=1", "lmda=2", "lmda=9"]
        assert recs[0]["result"]["top1"] == 42.0
        assert "error" in recs[2]          # failures are logged, not fatal

        # resume: completed combos are skipped, only the grid extension runs
        calls.clear()
        res2 = sweep.main(["--base", "--dataset cifar10",
                           "--grid", "lmda=1,2,9,4", "--out", str(out)])
        assert [r["combo"] for r in res2] == ["lmda=4"]
        assert len(calls) == 1 and calls[0][-1] == "4"
