"""Minimal URDF writer for mesh bodies.

The reference generates throwaway URDFs so Bullet can load arbitrary OBJs
(SPH/utils/urdf.py in jason-huang03/SPH_Project; note its unit inertia, which
this framework's rigid integrator reproduces). The on-device integrator needs
no URDF, but the writer is kept for interop — exporting a scene's rigid
bodies to robotics toolchains.
"""
from __future__ import annotations


def create_urdf(mesh_path: str, mass: float, scale, urdf_path: str,
                inertia=(1.0, 1.0, 1.0)) -> None:
    ixx, iyy, izz = inertia
    content = f"""<robot name="sph_rigid_body">
  <link name="baseLink">
    <inertial>
      <origin xyz="0 0 0" rpy="0 0 0"/>
      <mass value="{mass}"/>
      <inertia ixx="{ixx}" ixy="0" ixz="0" iyy="{iyy}" iyz="0" izz="{izz}"/>
    </inertial>
    <visual>
      <origin xyz="0 0 0" rpy="0 0 0"/>
      <geometry>
        <mesh filename="{mesh_path}" scale="{scale[0]} {scale[1]} {scale[2]}"/>
      </geometry>
    </visual>
    <collision>
      <origin xyz="0 0 0" rpy="0 0 0"/>
      <geometry>
        <mesh filename="{mesh_path}" scale="{scale[0]} {scale[1]} {scale[2]}"/>
      </geometry>
    </collision>
  </link>
</robot>
"""
    with open(urdf_path, "w") as f:
        f.write(content)
