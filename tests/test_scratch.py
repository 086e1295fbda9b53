"""Identity rules of the per-dataset scratch keying (scratch.py).

Every materialize-once face trusts the scratch tree keyed here; these
pins are what make "one dataset -> one scratch tree, two datasets ->
two" a tested contract instead of a docstring claim.
"""

from __future__ import annotations

import os

from github_event_etl_spark.scratch import dataset_tag, scratch_dir


def test_symlink_and_target_share_one_scratch_tree(tmp_path):
    real = tmp_path / "dataset"
    real.mkdir()
    link = tmp_path / "alias"
    os.symlink(real, link)
    assert dataset_tag(str(link)) == dataset_tag(str(real))
    assert scratch_dir(str(link), "x") == scratch_dir(str(real), "x")


def test_trailing_slash_and_dot_segments_are_identity_neutral(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    p = str(d)
    assert scratch_dir(p, "x") == scratch_dir(p + "/", "x")
    assert scratch_dir(p, "x") == scratch_dir(
        str(tmp_path / "." / "ds"), "x"
    )


def test_same_basename_different_dirs_get_distinct_trees(tmp_path):
    a = tmp_path / "a" / "sf0.01"
    b = tmp_path / "b" / "sf0.01"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    ta, tb = scratch_dir(str(a), "x"), scratch_dir(str(b), "x")
    assert ta != tb
    # both stay readable: basename survives in the directory name
    assert "sf0.01-" in ta and "sf0.01-" in tb


def test_root_resolving_path_keeps_readable_component():
    """A dataset path that realpath-resolves to '/' has no basename;
    the component must fall back to 'root-<tag>' rather than silently
    degrading to a bare '-<tag>'."""
    d = scratch_dir("/")
    component = os.path.basename(d)
    assert component.startswith("root-")
    assert component == f"root-{dataset_tag('/')}"


def test_parts_compose_under_the_dataset_root(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    root = scratch_dir(str(d))
    nested = scratch_dir(str(d), "layer", "leaf")
    assert nested.startswith(root + os.sep)
    assert nested.endswith(os.path.join("layer", "leaf"))
