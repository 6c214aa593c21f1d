import jax, jax.numpy as jnp
from pota_tpu import CameraConfig, CameraType, RenderConfig
from pota_tpu.optics.fit import get_or_fit_lens
from pota_tpu.optics.focus import setup_po_camera
from pota_tpu.render import scene as sc
from pota_tpu.render.renderer import look_at, render_sample_stream
from pota_tpu.render import splat as spl
from pota_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
FLAGSHIP = "angenieux__double_gauss__1953__49mm"
poly = get_or_fit_lens(FLAGSHIP)
cfg = CameraConfig(camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
                   fstop=2.8, focus_distance=20.0, vignetting_retries=3,
                   splat_queue_mult=8, splat_chunks=16)
state = setup_po_camera(poly, cfg)
rc = RenderConfig(xres=1920, yres=1080, spp=1)
scene = sc.lightgrid_scene(n=5, spacing=12.0, z=-150.0, radius=0.8, intensity=40.0)
m = look_at([0, 0, 0], [0, 0, -1])
stream = jax.jit(lambda _: render_sample_stream(cfg, rc, scene, m, 0, po_lens=poly, po_state=state))(0)
w2c = spl.world_to_camera(m)
p_cam = (stream["P"] @ w2c[:3, :3].T + w2c[:3, 3]) * cfg.unit_scale_filter
redistribute, budget, coc, sky = spl.compute_gates_and_budget(cfg, rc, stream, p_cam, po_lens=poly, po_state=state)
n = budget.shape[0]; S = cfg.splat_queue_mult * n
src, lane, slot_on, granted = spl.splat_queue(budget, redistribute, 1, S)
live = int(jnp.sum(granted))
print(f"samples n={n}  queue S={S}  live slots={live}  ({100*live/S:.1f}% of queue)")
print(f"redistributed sources: {int(jnp.sum(redistribute))}  budget sum={int(jnp.sum(jnp.where(redistribute,budget,0)))}")
