"""scripts/tpu_rehearsal_pin.py plumbing: artifact hashing must be
deterministic and value-sensitive, and the two-run comparison must pass on
identical digests / fail (on a TPU backend) on differing ones. The real
double-run executes on the v5e (record committed in ROADMAP); the full
chain itself is covered by tests/test_rehearsal.py."""

import json

import jax.numpy as jnp

import scripts.tpu_rehearsal_pin as pin


def test_hash_tree_deterministic_and_sensitive():
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "b": {"c": jnp.ones(4, jnp.bfloat16)}}
    h1 = pin._hash_tree(tree)
    h2 = pin._hash_tree({"a": tree["a"] + 0, "b": {"c": tree["b"]["c"] + 0}})
    assert h1 == h2  # same values, fresh buffers
    bumped = {"a": tree["a"] + 1e-7, "b": tree["b"]}
    assert pin._hash_tree(bumped) != h1
    # key order must not matter (sorted by path)
    reordered = {"b": tree["b"], "a": tree["a"]}
    assert pin._hash_tree(reordered) == h1


def _run_main(monkeypatch, tmp_path, digests_by_run, backend="tpu",
              extra_args=()):
    runs = iter(digests_by_run)
    monkeypatch.setattr(pin, "run_rehearsal", lambda wd: next(runs))
    monkeypatch.setattr(
        "sys.argv",
        ["tpu_rehearsal_pin.py", "--record", str(tmp_path / "rec.json"),
         *extra_args],
    )

    class FakeJax:
        @staticmethod
        def default_backend():
            return backend

        @staticmethod
        def devices():
            return ["fake"]

    monkeypatch.setitem(__import__("sys").modules, "jax", FakeJax)
    rc = pin.main()
    record = json.loads((tmp_path / "rec.json").read_text())
    return rc, record


def test_main_identical_runs_pass(monkeypatch, tmp_path):
    d = {"ckpt_a": "0123", "eval.json": 0.5}
    rc, record = _run_main(monkeypatch, tmp_path, [dict(d), dict(d)])
    assert rc == 0
    assert record["bit_identical"] is True
    assert record["artifacts_compared"] == 2


def test_main_differing_runs_fail_on_tpu(monkeypatch, tmp_path):
    rc, record = _run_main(
        monkeypatch, tmp_path,
        [{"ckpt_a": "0123"}, {"ckpt_a": "4567"}],
    )
    assert rc == 1
    assert record["bit_identical"] is False
    assert record["differing"] == {"ckpt_a": ["0123", "4567"]}


def test_main_no_assert_reports_only(monkeypatch, tmp_path):
    rc, record = _run_main(
        monkeypatch, tmp_path,
        [{"ckpt_a": "0123"}, {"ckpt_a": "4567"}],
        extra_args=("--no-assert",),
    )
    assert rc == 0 and record["bit_identical"] is False
