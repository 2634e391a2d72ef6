"""Per-frame Blender render script (runs inside `blender --python`).

Counterpart of the reference's rendering_script.py (material transfer +
per-frame render; /root/reference/rendering_script.py:37-59): a .blend file
provides template objects carrying materials, named after the simulation
objects; each frame's exported OBJs are imported, given the template's
materials, the templates are removed, and the frame is rendered.

Invocation (see render.py):

    blender -b scene.blend --python rendering_script.py -- \
        <frame_dir> [output_image] [device_type] [device_id]

- device_type: CYCLES compute device (OPTIX / CUDA / HIP / METAL / NONE).
  NONE (default) renders on CPU, so the script degrades gracefully on
  machines without a GPU.
- device_id: which device of that type to enable (round-robin index from the
  render farm driver).
"""
import os
import sys

import bpy


def _argv_after_dashdash():
    argv = sys.argv
    return argv[argv.index("--") + 1:] if "--" in argv else []


def configure_device(device_type: str, device_id: int) -> None:
    if device_type in ("", "NONE", "CPU"):
        bpy.context.scene.cycles.device = "CPU"
        return
    prefs = bpy.context.preferences.addons["cycles"].preferences
    prefs.compute_device_type = device_type
    prefs.get_devices()
    count = 0
    for dev in prefs.devices:
        if dev.type == device_type:
            dev.use = count == device_id
            if dev.use:
                print(f"rendering on {dev.name} ({device_type} #{device_id})")
            count += 1
        else:
            dev.use = False
    bpy.context.scene.cycles.device = "GPU"
    if device_type == "OPTIX":
        bpy.context.scene.cycles.use_denoising = True
        bpy.context.scene.cycles.denoiser = "OPTIX"


def import_obj(path: str):
    """Import an OBJ with whichever operator this Blender version has."""
    if hasattr(bpy.ops.wm, "obj_import"):          # Blender >= 3.3 native
        bpy.ops.wm.obj_import(filepath=path)
    else:                                          # legacy addon importer
        bpy.ops.import_scene.obj(filepath=path)
    return bpy.context.selected_objects[0]


def main() -> None:
    args = _argv_after_dashdash()
    if not args:
        raise SystemExit("usage: blender -b <blend> --python rendering_script.py"
                         " -- <frame_dir> [out.png] [device_type] [device_id]")
    frame_dir = args[0]
    out_path = args[1] if len(args) > 1 else os.path.join(frame_dir, "render.png")
    device_type = args[2] if len(args) > 2 else "NONE"
    device_id = int(args[3]) if len(args) > 3 else 0

    bpy.context.scene.render.engine = "CYCLES"
    configure_device(device_type, device_id)

    # Import every frame OBJ; move materials over from the same-named template
    # object in the .blend, then drop the template so only the frame geometry
    # renders. OBJs without a template keep their default material.
    for fname in sorted(os.listdir(frame_dir)):
        if not fname.endswith(".obj"):
            continue
        stem = os.path.splitext(fname)[0]
        imported = import_obj(os.path.join(frame_dir, fname))
        imported.name = stem + "_frame"
        template = bpy.data.objects.get(stem)
        if template is not None and template.data is not None:
            imported.data.materials.clear()
            for mat in template.data.materials:
                imported.data.materials.append(mat)
            bpy.data.objects.remove(template, do_unlink=True)

    bpy.context.scene.render.filepath = out_path
    bpy.ops.render.render(write_still=True)


main()
