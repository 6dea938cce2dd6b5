"""Application shell / CLI.

Mirrors the reference's headless command surface (reference app.py:391-452
``parse_command_line`` + use_cmd_optargs :455-518):
  -i/--import DIR      import DICOM directory (largest series)
  --import-folder DIR  import bitmap stack directory
  --import-file FILE   import NIfTI/Analyze file
  -t/--threshold A,B   threshold preset range or name
  -e/--export FILE     segment + export surface (STL/PLY/OBJ/...)
  -a/--export-to-all   export every mask using threshold presets
  -s/--save FILE       save .inv3 project
  --export-project F   export project to HDF5 (.h5) or NIfTI (.nii)
  --no-gui             headless (implied; this build is headless-first)
  --quality            surface quality preset name
  --algorithm          surface algorithm: Default | ca_smoothing | Binary

Example (the reference's canonical smoke flow, SURVEY §3.3):
  python -m invesalius3_tpu.app -i DIR -t 226,3071 -e out.stl
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from invesalius3_tpu import constants as const, events
from invesalius3_tpu.utils.i18n import tr
from invesalius3_tpu.core.project import Project
from invesalius3_tpu.core.session import Session
from invesalius3_tpu.core.slice import Slice
from invesalius3_tpu.core.volume import Volume


def parse_command_line(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="invesalius3_tpu", description=__doc__)
    p.add_argument("-i", "--import", dest="dicom_dir", help="import a DICOM directory")
    p.add_argument("--import-all", dest="import_all", action="store_true",
                   help="import all series (not only the largest)")
    p.add_argument("--import-folder", dest="bitmap_dir", help="import a bitmap stack directory")
    p.add_argument("--import-file", dest="other_file", help="import NIfTI/Analyze/.inv3 file")
    p.add_argument("-t", "--threshold", help="'min,max' or a preset name (e.g. Bone)")
    p.add_argument("-e", "--export", dest="export_surface", help="export surface mesh file")
    p.add_argument("--import-surface", dest="import_surface", metavar="FILE",
                   help="import a mesh file (STL/PLY/OBJ/VTP/3MF/.bin) as a "
                        "surface; small holes are capped (reference "
                        "surface.py:619 OnImportSurfaceFile)")
    p.add_argument("-a", "--export-to-all", dest="export_all",
                   help="basename: export one surface per threshold preset")
    p.add_argument("-s", "--save", dest="save_project", help="save .inv3 project")
    p.add_argument("--export-project", help="export project to .h5 or .nii[.gz]")
    p.add_argument("--no-gui", action="store_true", default=True,
                   help="headless mode (default in this build)")
    p.add_argument("--quality", default=const.DEFAULT_SURFACE_QUALITY,
                   choices=list(const.SURFACE_QUALITY))
    p.add_argument("--algorithm", default="Default",
                   choices=["Default", "ca_smoothing", "Binary"])
    p.add_argument("--spacing", help="override spacing 'sx,sy,sz' (bitmap import)")
    p.add_argument("--debug", action="store_true", help="log every bus event")
    p.add_argument("--remote-host", dest="remote_host",
                   help="mirror the event bus to host:port (reference --remote-host)")
    p.add_argument("--use-pedal", dest="use_pedal", action="store_true",
                   help="enable MIDI pedal input (reference --use-pedal)")
    p.add_argument("--debug-efield", dest="debug_efield", action="store_true",
                   help="use the synthetic e-field solver instead of the "
                        "external NeuronavigationApi one (reference "
                        "app.py:445 --debug-efield)")
    p.add_argument("--cranioplasty", nargs=2, metavar=("INPUT", "OUTPUT"),
                   help="run cranioplasty implant segmentation on a volume "
                        "and export the implant surface (reference "
                        "run_cranioplasty_implant)")
    p.add_argument("--serve", type=int, metavar="PORT", default=None,
                   help="start the HTTP viewer server on PORT and block")
    p.add_argument("--shell", action="store_true",
                   help="drop into an interactive Python shell with the app "
                        "context (slc, project, session, volume, ops, np, "
                        "jnp) after the batch steps — the headless analog of "
                        "the reference's embedded console "
                        "(gui/interactive_shell.py:121)")
    return p.parse_args(argv)


def import_data(args) -> Volume:
    if args.dicom_dir:
        from invesalius3_tpu.io import dicom

        groups = dicom.load_dicom_dir(args.dicom_dir)
        if not groups:
            raise SystemExit(tr("no DICOM series found in {dir}").format(dir=args.dicom_dir))
        group = max(groups, key=lambda g: len(g.files))
        data, spacing, affine = dicom.group_to_volume(group)
        modality = group.files[0].get("Modality", "CT")
        return Volume.from_numpy(data, spacing=spacing, affine=affine, modality=modality)
    if args.bitmap_dir:
        from invesalius3_tpu.io import bitmap

        spacing = (1.0, 1.0, 1.0)
        if args.spacing:
            spacing = tuple(float(x) for x in args.spacing.split(","))
        data, spacing = bitmap.load_bitmap_dir(args.bitmap_dir, spacing)
        return Volume.from_numpy(data, spacing=spacing)
    if args.other_file:
        path = Path(args.other_file)
        if path.suffix == ".inv3":
            proj = Project.open(path)
            return proj.volume
        if path.suffix.lower() in (".par", ".rec"):
            from invesalius3_tpu.io import parrec

            data, spacing = parrec.read_par_rec(path)
            return Volume.from_numpy(data, spacing=spacing)
        from invesalius3_tpu.io import nifti

        img = nifti.read_nifti(path)
        return Volume.from_numpy(img.data, spacing=img.spacing, affine=img.affine)
    raise SystemExit(tr("no input given: use -i / --import-folder / --import-file"))


def parse_threshold(spec: str, modality: str = "CT"):
    presets = const.THRESHOLD_PRESETS_CT if modality == "CT" else const.THRESHOLD_PRESETS_OTHER
    if spec in presets:
        return presets[spec]
    try:
        a, b = spec.split(",")
        return (float(a), float(b))
    except ValueError:
        raise SystemExit(f"bad threshold {spec!r}: use 'min,max' or one of {list(presets)}")


def main(argv=None) -> int:
    args = parse_command_line(argv)
    if args.debug:
        events.subscribe(
            events.wants_topic(lambda topic=None, **kw: print(f"[event] {topic} {kw}",
                                                              file=sys.stderr)),
            events.ALL_TOPICS,
        )

    session = Session()
    backup = session.recover_auto_backup()  # reference splash
    if backup is not None:  # CheckCrashRecovery (app.py:287-366)
        print(tr("previous session did not exit cleanly; auto-backup at "
                 "{path} (open with --import-file or POST "
                 "/api/session/recover)").format(path=backup),
              file=sys.stderr)
    session.mark_running()
    if args.debug_efield:  # reference app.py:661 session SetConfig
        session.set_config("debug_efield", True)
    remote = None
    if args.remote_host:
        from invesalius3_tpu.net.remote_control import RemoteControl

        host, _, port = args.remote_host.partition(":")
        remote = RemoteControl(host, int(port or 5000))
        remote.connect()
        print(tr("remote control mirroring to {host}").format(host=args.remote_host),
              file=sys.stderr)
    if args.use_pedal:
        from invesalius3_tpu.net.pedal_connection import PedalConnector

        PedalConnector(use_midi=True)
    try:
        if args.cranioplasty:
            return run_cranioplasty(args.cranioplasty[0], args.cranioplasty[1])
        if args.import_surface and not (args.dicom_dir or args.bitmap_dir
                                        or args.other_file):
            # standalone mesh flow: import (+hole-fill), report, re-export
            from invesalius3_tpu.core.surface import import_surface_file

            surf = import_surface_file(args.import_surface)
            print(tr("imported {path}: {tris} triangles, volume={vol} mm^3, "
                     "area={area} mm^2").format(
                path=args.import_surface, tris=len(surf.faces),
                vol=f"{surf.volume:.1f}", area=f"{surf.area:.1f}"),
                file=sys.stderr)
            if surf.filled_holes:
                print(tr("filled {n} holes").format(n=surf.filled_holes),
                      file=sys.stderr)
            if args.export_surface:
                surf.export(args.export_surface)
                print(tr("exported {path}").format(path=args.export_surface),
                      file=sys.stderr)
            return 0
        if args.import_all and args.dicom_dir:
            # one surface export per DICOM series, suffixed by the group
            # title (reference app.py:490-497 --import-all loop)
            from invesalius3_tpu.io import dicom

            groups = dicom.load_dicom_dir(args.dicom_dir)
            if not groups:
                raise SystemExit(tr("no DICOM series found in {dir}").format(
                    dir=args.dicom_dir))
            for g in groups:
                data, spacing, affine = dicom.group_to_volume(g)
                vol = Volume.from_numpy(
                    data, spacing=spacing, affine=affine,
                    modality=g.files[0].get("Modality", "CT"))
                gslc = Slice(vol)
                if args.threshold:
                    tmin, tmax = parse_threshold(args.threshold, vol.modality)
                    gslc.create_new_mask(threshold_range=(tmin, tmax))
                else:
                    gslc.create_new_mask()
                if args.export_surface:
                    surf = gslc.create_surface_from_mask(
                        quality=args.quality, algorithm=args.algorithm)
                    base = Path(args.export_surface)
                    title = (g.preview_info()["series_uid"][-8:]
                             if hasattr(g, "preview_info") else "series")
                    out = base.with_name(f"{base.stem}_{title}{base.suffix}")
                    surf.export(str(out))
                    print(tr("exported {path}").format(path=out),
                          file=sys.stderr)
            return 0
        volume = import_data(args)
        from invesalius3_tpu.utils.logging import ensure_logging, get_logger
        ensure_logging(console=False)
        get_logger("app").info("imported volume %s %s spacing=%s",
                               volume.shape, volume.dtype, volume.spacing)
        print(tr("volume: {shape} {dtype} spacing={spacing}").format(
            shape=volume.shape, dtype=volume.dtype, spacing=volume.spacing),
            file=sys.stderr)

        slc = Slice(volume)
        project = Project()
        project.volume = volume
        project.modality = volume.modality
        project.name = "cli_project"

        if args.threshold:
            tmin, tmax = parse_threshold(args.threshold, volume.modality)
            mask = slc.create_new_mask(threshold_range=(tmin, tmax))
            project.add_mask(mask)
            n = int(np.asarray(mask.visible_array()).sum())
            print(tr("threshold [{tmin}, {tmax}]: {n} voxels").format(
                tmin=tmin, tmax=tmax, n=n), file=sys.stderr)

        if args.import_surface:
            from invesalius3_tpu.core.surface import import_surface_file

            surf = import_surface_file(args.import_surface)
            project.add_surface(surf)
            print(tr("imported {path}: {tris} triangles, volume={vol} mm^3, "
                     "area={area} mm^2").format(
                path=args.import_surface, tris=len(surf.faces),
                vol=f"{surf.volume:.1f}", area=f"{surf.area:.1f}"),
                file=sys.stderr)

        if args.export_surface:
            if not slc.current_mask:
                slc.create_new_mask()
            surf = slc.create_surface_from_mask(
                quality=args.quality, algorithm=args.algorithm)
            project.add_surface(surf)
            surf.export(args.export_surface)
            print(tr("exported {path}: {tris} triangles, volume={vol} mm^3, "
                     "area={area} mm^2").format(
                path=args.export_surface, tris=len(surf.faces),
                vol=f"{surf.volume:.1f}", area=f"{surf.area:.1f}"),
                file=sys.stderr)

        if args.export_all:
            base = Path(args.export_all)
            presets = (const.THRESHOLD_PRESETS_CT if volume.modality == "CT"
                       else const.THRESHOLD_PRESETS_OTHER)
            for pname, (tmin, tmax) in presets.items():
                if pname == "Custom":
                    continue
                m = slc.create_new_mask(name=pname, threshold_range=(tmin, tmax))
                if not bool(np.asarray(m.visible_array()).any()):
                    continue
                surf = slc.create_surface_from_mask(m, quality=args.quality,
                                                    algorithm=args.algorithm)
                out = base.with_name(f"{base.stem}_{pname.replace(' ', '_')}{base.suffix}")
                surf.export(str(out))
                print(f"exported {out}", file=sys.stderr)

        for m in slc.masks.values():
            project.add_mask(m)
        if getattr(slc, "_image_versions", None):
            project.image_versions = slc.image_versions

        if args.save_project:
            project.save(args.save_project)
            session.add_recent_project(args.save_project, project.name)
            print(tr("saved {path}").format(path=args.save_project), file=sys.stderr)

        if args.export_project:
            out = args.export_project
            if out.endswith((".h5", ".hdf5")):
                project.export_to_hdf5(out)
            else:
                project.export_to_nifti(out)
            print(tr("exported project to {path}").format(path=out), file=sys.stderr)

        if args.serve is not None:
            from invesalius3_tpu.server import ViewerServer

            srv = ViewerServer(slc, port=args.serve)
            srv.start()
            print(tr("viewer server on {url}").format(
                url=f"http://127.0.0.1:{srv.port}"), file=sys.stderr)
            if args.shell:
                run_shell(slc, project, session, volume, server=srv)
                srv.stop()
                return 0
            try:
                import time

                while True:
                    time.sleep(3600)
            except KeyboardInterrupt:
                srv.stop()
        elif args.shell:
            run_shell(slc, project, session, volume)
        return 0
    finally:
        if remote is not None:
            remote.disconnect()
        session.exit()


def run_shell(slc, project, session, volume, server=None) -> None:
    """Interactive Python console with the live app context — the headless
    analog of the reference's embedded shell (gui/interactive_shell.py:121,
    which exposes the wx app's namespace in a PyCrust pane).  Everything a
    panel could do is reachable through ``slc``/``project``/``events``."""
    import code

    import jax.numpy as jnp

    import invesalius3_tpu.ops as ops

    ns = {
        "np": np, "jnp": jnp, "ops": ops, "const": const, "events": events,
        "slc": slc, "project": project, "session": session, "volume": volume,
    }
    if server is not None:
        ns["server"] = server
    banner = tr(
        "invesalius3_tpu shell — objects: {names}\n"
        "e.g. slc.create_new_mask(threshold_range=(226, 3071))").format(
        names=", ".join(sorted(ns)))
    code.interact(banner=banner, local=ns, exitmsg="")


def run_cranioplasty(input_path, output_path) -> int:
    """Headless cranioplasty implant flow (reference segment.py:30
    run_cranioplasty_implant + app.py --cranioplasty)."""
    from invesalius3_tpu.io.nifti import read_nifti
    from invesalius3_tpu.models.segment import ImplantSegmenter
    from invesalius3_tpu.core.mask import Mask
    from invesalius3_tpu.core.surface import create_surface_from_mask
    import jax.numpy as jnp

    img = read_nifti(input_path)
    seg = ImplantSegmenter(method="binary")
    prob, mask_arr = seg.segment(img.data)
    m = Mask()
    m.data = jnp.asarray(mask_arr)
    surf = create_surface_from_mask(m, img.spacing, name="implant")
    surf.export(output_path)
    print(tr("implant exported to {path}: {tris} triangles").format(
        path=output_path, tris=len(surf.faces)), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
