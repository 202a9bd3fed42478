#!/usr/bin/env python
"""Identify inertial + friction parameters from measurements.

CLI counterpart of the reference's identifier.py main (:1441-1616):
loads config + URDF + measurement npz files, optionally merges
unobservable params from the trajectory file into dontChangeParams,
runs the (optionally block-selecting) identification, renders console
and HTML reports, validates on held-out data, and exports the
identified model to URDF when physically consistent.
"""

from __future__ import annotations

import numpy as np

from flobaroid_tpu.utils.cli import base_parser, load_cli_config, setup_jax


def main():
    setup_jax()
    p = base_parser("Identify dynamics parameters from measurements")
    p.add_argument("--measurements", action="append", nargs="+", required=True,
                   help="measurements npz file(s), repeatable")
    p.add_argument("--validation", "--verification", "--verify",
                   help="measurements npz for validation")
    p.add_argument("--model_real", help="URDF with ground-truth params (simulation)")
    p.add_argument("-o", "--model_output", "--output",
                   help="write identified URDF here")
    p.add_argument("--trajectory", help="trajectory npz (for unobservable params)")
    p.add_argument("--plot", action="store_true", help="create plots")
    args = p.parse_args()
    config = load_cli_config(args)

    from flobaroid_tpu.identification.identifier import Identification
    from flobaroid_tpu.output import OutputConsole, OutputMatplotlib
    from flobaroid_tpu.utils import helpers

    # merge unobservable params from the trajectory file into
    # dontChangeParams (reference identifier.py:1536-1562)
    if args.trajectory:
        try:
            with np.load(args.trajectory, allow_pickle=True) as f:
                if "unobservable_params" in f.files:
                    unobs = [int(v) for v in f["unobservable_params"]]
                    if unobs:
                        cur = set(config.get("dontChangeParams", []))
                        config["dontChangeParams"] = sorted(cur | set(unobs))
                        print(f"pinning {len(unobs)} unobservable params to a priori")
        except (OSError, KeyError) as e:
            print(f"could not read trajectory file: {e}")

    from flobaroid_tpu.utils.timing import jax_profile, stage_timer

    with stage_timer("model + projections", config):
        idf = Identification(
            config,
            config["urdf"],
            urdf_file_real=args.model_real,
            measurements_files=args.measurements,
            regressor_file=config.get("regressor"),
            validation_file=args.validation,
        )

    if config.get("filterMeasurements", 0) or config.get("preprocessMeasurements", 1):
        # raw hardware data needs the filtering/differentiation chain;
        # files written by simulator.py carry *_raw + filtered channels
        # already, so only preprocess when requested or raw-only
        if "velocities_raw" not in idf.data.samples or config.get("filterMeasurements", 0):
            idf.data.preprocess()

    if config.get("removeNearZero", 0):
        idf.data.remove_near_zero_samples()

    if config.get("selectBlocksFromMeasurements", 0):
        # Venture-2009 block selection (reference identifier.py:1564-1589
        # + data.py:205-344): ONE regressor pass over all measurements,
        # then per-block base-regressor conds, per-link subregressor
        # conds, near-duplicate variance dropping and a greedy
        # keep-if-improves pass on exact union Grams
        if not int(config.get("materializeRegressor", 1)):
            raise ValueError(
                "selectBlocksFromMeasurements needs materializeRegressor=1 "
                "(per-block rows are sliced from the stacked regressor)"
            )
        m = idf.model
        m.computeRegressors(idf.data)
        rows_per = m.num_dofs + m.fb
        skip = int(config["skipSamples"]) + 1
        bs = int(config["blockSize"])
        n_blocks = idf.data.num_blocks()
        conds, link_conds, grams = [], [], []
        for b in range(n_blocks):
            # used sample u covers raw index u*skip: raw block
            # [b*bs, (b+1)*bs) maps to used [ceil(b*bs/skip),
            # ceil((b+1)*bs/skip)) — a floor-divided block length
            # drifts ~b*(bs mod skip)/skip samples by block b
            u0 = -(-(b * bs) // skip)
            u1 = -(-((b + 1) * bs) // skip)
            r0 = u0 * rows_per
            r1 = min(u1 * rows_per, m.YBase.shape[0])
            Yb = m.YBase[r0:r1]
            conds.append(float(np.linalg.cond(Yb)) if len(Yb) else 1e16)
            grams.append(Yb.T @ Yb)
            link_conds.append(m.getSubregressorsConditionNumbers(YBase=Yb))
        idf.data.select_blocks_from_stats(conds, link_conds, grams)
        print(f"selected blocks: {idf.data.selected_blocks} "
              f"(conds {['%.3g' % c for c in conds]})")

    with jax_profile(config.get("jaxProfileDir")), stage_timer("estimation", config):
        idf.estimateParameters()

    if config.get("showMemUsage", 0):
        from flobaroid_tpu.utils.timing import print_mem_usage

        print_mem_usage(
            dict(
                YStd=idf.model.YStd,
                YBase=idf.model.YBase,
                G_rows=getattr(idf.model, "G_rows", None),
                tauMeasured=idf.model.tauMeasured,
                samples=idf.data.samples,
            )
        )

    # validation must run BEFORE rendering so the console/report can show
    # val_error/val_residual/val_nrms (reference identifier.py:303-320 prints
    # them inside estimateValidationTorques; we print via OutputConsole)
    if args.validation:
        idf.estimateValidationTorques()

    console = OutputConsole(idf)
    text = console.render()

    if config.get("outputLatex", 0):
        print(console.render_latex())

    if args.plot or config.get("createPlots", 0):
        OutputMatplotlib(idf, text=text).render()

    if args.model_output:
        xStd = idf._full_xstd()
        if helpers.is_physical_consistent(xStd[: idf.model.num_model_params], idf.model.num_links):
            from flobaroid_tpu.models.urdf import replace_params_in_urdf

            fric = None
            if hasattr(idf, "postid_friction"):
                fric = {
                    idf.model.jointNames[j]: {
                        "friction": idf.postid_friction["Fc"][j],
                        "damping": idf.postid_friction["Fv"][j],
                    }
                    for j in range(idf.model.num_dofs)
                }
            elif config["identifyFrictionSimultaneously"] and config["identifySymmetricVelFriction"]:
                fs = idf.model.friction_params_start
                nd = idf.model.num_dofs
                fric = {
                    idf.model.jointNames[j]: {
                        "friction": xStd[fs + j],
                        "damping": xStd[fs + nd + j],
                    }
                    for j in range(nd)
                }
            replace_params_in_urdf(
                config["urdf"], args.model_output, xStd[: idf.model.num_model_params],
                idf.model.linkNames, friction=fric,
            )
            print(f"Wrote identified model to {args.model_output}")
        else:
            print("identified params are not physically consistent — NOT writing URDF "
                  "(enable constrainToConsistent for guaranteed-consistent output)")

    return idf


if __name__ == "__main__":
    main()
