from drivescenegen_tpu.models.unet2d import UNet2D  # noqa: F401
