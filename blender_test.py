# Render-device enumeration smoke (reference blender_test.py:1-8).
#
# Under Blender:  blender -b --python blender_test.py
#   lists every Cycles device (the reference's behavior verbatim).
# Standalone:     python blender_test.py
#   bpy is unavailable outside Blender; falls back to enumerating the
#   devices the repo's dependency-free preview backend (io/render3d.py,
#   numpy z-buffer) and the JAX runtime would use, so the smoke still
#   answers "what can render here?" on a display-less TPU host.

try:
    import bpy

    prefs = bpy.context.preferences.addons["cycles"].preferences
    prefs.get_devices()
    print("Cycles Devices:")
    for device in prefs.devices:
        print(f"  {device.name}: {device.type}")
except ImportError:
    print("bpy unavailable (not running under Blender)")
    print("Fallback render backends:")
    print("  numpy z-buffer preview (sph_project_tpu/io/render3d.py): CPU")
    try:
        import jax

        for d in jax.devices():
            print(f"  JAX: {d.device_kind} ({d.platform})")
    except Exception as e:  # noqa: BLE001 — smoke must not crash
        print(f"  JAX unavailable: {type(e).__name__}: {e}")
