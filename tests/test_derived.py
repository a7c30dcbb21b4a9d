"""ensure_derived cache-key lifecycle: the key must cover the build CODE.

VERDICT r5 §What's-wrong #2: keying only on fixture path + data
fingerprint + a manually-bumped ``params`` string means an edited builder
silently serves the stale derivation — every downstream oracle then
mismatches with no error pointing at the cache. These tests pin the
structural fix: editing the builder module yields a fresh key; an
unchanged builder hits the cache.
"""

from __future__ import annotations

import importlib.util
import os
import sys

from pixels_spark.storage.derived import build_fingerprint, ensure_derived

_MOD_V1 = '''
def build(spark, dest):
    with open(dest + "/out.txt", "w") as f:
        f.write("v1")
'''

_MOD_V2 = '''
def build(spark, dest):
    with open(dest + "/out.txt", "w") as f:
        f.write("v2-changed-logic")
'''


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_changed_build_code_changes_key(tmp_path, sf_dir):
    """Same fixture, same name, same params — editing the builder module
    must produce a different cache dir (fresh build, not a stale serve)."""
    modfile = tmp_path / "derived_builder_mod.py"
    cache = str(tmp_path / "cache")
    src = os.path.join(sf_dir, "region.parquet")

    modfile.write_text(_MOD_V1)
    m1 = _load(str(modfile), "derived_builder_mod_v1")
    d1 = ensure_derived(
        None, sf_dir, name="t", source_paths=[src], build=m1.build, cache_root=cache
    )

    modfile.write_text(_MOD_V2)
    m2 = _load(str(modfile), "derived_builder_mod_v2")
    d2 = ensure_derived(
        None, sf_dir, name="t", source_paths=[src], build=m2.build, cache_root=cache
    )

    assert d1 != d2, "edited builder served a stale derivation"
    assert open(os.path.join(d1, "out.txt")).read() == "v1"
    assert open(os.path.join(d2, "out.txt")).read() == "v2-changed-logic"


def test_unchanged_build_hits_cache(tmp_path, sf_dir):
    modfile = tmp_path / "derived_builder_mod.py"
    modfile.write_text(_MOD_V1)
    m = _load(str(modfile), "derived_builder_mod_stable")
    cache = str(tmp_path / "cache")
    src = os.path.join(sf_dir, "region.parquet")

    calls = []

    def counting_build(spark, dest):
        calls.append(dest)
        m.build(spark, dest)

    # same callable twice → one build, same dir
    d1 = ensure_derived(
        None, sf_dir, name="t", source_paths=[src], build=counting_build,
        cache_root=cache,
    )
    d2 = ensure_derived(
        None, sf_dir, name="t", source_paths=[src], build=counting_build,
        cache_root=cache,
    )
    assert d1 == d2
    assert len(calls) == 1


def test_build_fingerprint_tracks_module_source(tmp_path):
    modfile = tmp_path / "fp_mod.py"
    modfile.write_text(_MOD_V1)
    m1 = _load(str(modfile), "fp_mod_a")
    fp1 = build_fingerprint(m1.build)
    assert fp1 == build_fingerprint(m1.build)  # deterministic

    modfile.write_text(_MOD_V2)
    m2 = _load(str(modfile), "fp_mod_b")
    assert build_fingerprint(m2.build) != fp1


def test_dep_modules_fold_into_key(tmp_path, sf_dir):
    """A builder whose behavior lives in another module must key on that
    module too: changing a dep module's file changes the key."""
    import os
    import sys

    dep_file = tmp_path / "dep_mod_for_key.py"
    dep_file.write_text("X = 1\n")
    m1 = _load(str(dep_file), "dep_mod_for_key_v1")

    def build(spark, dest):
        with open(os.path.join(dest, "out.txt"), "w") as f:
            f.write("v")

    from pixels_spark.storage.derived import build_fingerprint

    fp1 = build_fingerprint(build, deps=(m1,))
    dep_file.write_text("X = 2\n")
    m2 = _load(str(dep_file), "dep_mod_for_key_v2")
    fp2 = build_fingerprint(build, deps=(m2,))
    assert fp1 != fp2
    # no deps -> stable regardless of the dep file
    assert build_fingerprint(build) == build_fingerprint(build)
