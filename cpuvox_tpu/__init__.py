"""cpuvox_tpu — a TPU-native JAX/XLA/Pallas re-implementation of Voxlap-style voxel rendering.

Capabilities mirror pipliz/cpuvox (Unity C#/Burst CPU renderer, see /root/reference and
SURVEY.md), re-designed TPU-first:

- ``world``    packed RLE column voxel world + LOD mip chain + `.world` persistence
               (reference: Assets/Code/World.cs, WorldSaveFile.cs)
- ``assets``   .obj import, mesh rescale, batched triangle voxelization, RLE world build
               (reference: Utils/ObjModel.cs, Utils/SimpleMesh.cs, VoxelizerHelper.cs,
               WordBuilder.cs)
- ``render``   camera math, vanishing-point segment setup, the phase-1 ray march
               (oracle + vectorized XLA + Pallas kernel) and phase-2 screen reprojection
               (reference: RenderManager.cs, Rendering/DrawSegmentRayJob.cs,
               Utils/CameraData.cs, Utils/SegmentDDAData.cs, Shaders/RayBufferBlit.shader)
- ``ops``      Pallas TPU kernels (the native tier; reference's Burst jobs)
- ``parallel`` device-mesh sharding of rays / cameras (new design; reference is
               single-process, SURVEY.md §2 "Distributed communication backend")
- ``bench``    deterministic flythrough benchmark harness
               (reference: UnityManager.cs:79-97, BenchmarkPath.anim)
- ``models``   procedural/world "model" builders (terrain heightmaps, test scenes)
"""

__version__ = "0.1.0"
