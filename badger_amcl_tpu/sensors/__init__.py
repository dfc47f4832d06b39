from badger_amcl_tpu.sensors.odom import motion_update, OdomModel  # noqa: F401
from badger_amcl_tpu.sensors.planar import (  # noqa: F401
    PlanarScanParams,
    PlanarScan,
    planar_likelihood,
)
from badger_amcl_tpu.sensors.point_cloud import (  # noqa: F401
    PointCloudParams,
    point_cloud_likelihood,
)
