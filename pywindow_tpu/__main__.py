"""Command-line interface: ``python -m pywindow_tpu <command>``.

The reference has no CLI (its "programs" are user scripts); this is a
thin convenience layer over the same public API.

Commands:
  analyze FILE [--rebuild] [--forcefield FF] [--swap k=v] [-o OUT.json]
      Full structural analysis of a structure file (XYZ/PDB/MOL).
      With --rebuild, periodic systems are reconstructed and every
      molecule is analysed (one batched device sweep).
  trajectory FILE [--format dlpoly|xyz|pdb] [--frames A:B] [--batch N]
      [--exact-sizes] [--modular] [--rebuild] [--forcefield FF]
      [--swap k=v] [-o OUT.json]
      Batched analysis of an MD trajectory.
  bench
      Run the throughput benchmark (one JSON line).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys


def _swap_dict(pairs):
    out = {}
    for p in pairs or []:
        key, _, value = p.partition("=")
        if not value:
            msg = f"--swap expects key=value, got {p!r}"
            raise SystemExit(msg)
        out[key] = value
    return out or None


def _dump(obj, out):
    from pywindow_tpu.io.outputs import to_list

    text = json.dumps(obj, default=to_list, indent=1)
    if out:
        pathlib.Path(out).write_text(text)
        print(f"wrote {out}")
    else:
        print(text)


def cmd_analyze(args) -> None:
    import pywindow_tpu as pw

    molsys = pw.MolecularSystem.load_file(args.file)
    if args.swap:
        molsys.swap_atom_keys(_swap_dict(args.swap))
    if args.forcefield:
        molsys.decipher_atom_keys(args.forcefield)
    if args.rebuild:
        molsys.make_modular(rebuild=True)
        results = molsys.analyze_molecules()
        _dump({str(k): v for k, v in results.items()}, args.output)
    else:
        mol = molsys.system_to_molecule()
        _dump(mol.full_analysis(), args.output)


def cmd_trajectory(args) -> None:
    import pywindow_tpu as pw

    fmt = args.format
    if fmt is None:
        suffix = pathlib.Path(args.file).suffix.lower()
        fmt = {".xyz": "xyz", ".pdb": "pdb"}.get(suffix, "dlpoly")
    cls = {"dlpoly": pw.DLPOLY, "xyz": pw.XYZ, "pdb": pw.PDB}[fmt]
    traj = cls(args.file)
    frames = "all"
    if args.frames:
        a, _, b = args.frames.partition(":")
        frames = (int(a or 0), int(b or traj.no_of_frames))
    traj.analysis_batched(
        frames=frames,
        batch_size=args.batch,
        modular=args.modular or args.rebuild,
        rebuild=args.rebuild,
        swap_atoms=_swap_dict(args.swap),
        forcefield=args.forcefield,
        exact_sizes=args.exact_sizes,
        autosave=args.output,
        autosave_every=args.autosave_every,
    )
    if args.output:
        traj.save_analysis(args.output, override=True)
        print(
            f"analysed {len(traj.analysis_output)} frames -> {args.output}"
        )
    else:
        _dump(traj.analysis_output, None)


def cmd_bench(_args) -> None:
    import runpy

    bench = pathlib.Path(__file__).parent.parent / "bench.py"
    if not bench.is_file():
        msg = (
            "the benchmark (bench.py + its trajectory fixture) ships "
            "with the source repository, not the installed package; "
            "run it from a checkout"
        )
        raise SystemExit(msg)
    runpy.run_path(str(bench), run_name="__main__")


def main(argv=None) -> None:
    # TPU production mode is plain float32: the pore-centre stage uses
    # the symbolic-difference optimiser (config.pore_opt_mode "stable"),
    # so no x64/emulated-f64 is needed anywhere.

    parser = argparse.ArgumentParser(
        prog="python -m pywindow_tpu",
        description="TPU-native structural analysis of porous molecules",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("analyze", help="analyse one structure file")
    p.add_argument("file")
    p.add_argument("--rebuild", action="store_true")
    p.add_argument("--forcefield")
    p.add_argument("--swap", nargs="*", metavar="KEY=VALUE")
    p.add_argument("-o", "--output")
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser("trajectory", help="analyse an MD trajectory")
    p.add_argument("file")
    p.add_argument("--format", choices=["dlpoly", "xyz", "pdb"])
    p.add_argument("--frames", metavar="A:B")
    p.add_argument("--batch", type=int, default=480)
    p.add_argument("--exact-sizes", action="store_true")
    p.add_argument("--modular", action="store_true")
    p.add_argument("--rebuild", action="store_true")
    p.add_argument("--forcefield")
    p.add_argument("--swap", nargs="*", metavar="KEY=VALUE")
    p.add_argument("--autosave-every", type=int, default=10)
    p.add_argument("-o", "--output")
    p.set_defaults(fn=cmd_trajectory)

    p = sub.add_parser("bench", help="run the throughput benchmark")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
