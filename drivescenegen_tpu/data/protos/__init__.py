"""Generated protobuf bindings for the public Waymo Motion schema subset.

Regenerate with:  cd drivescenegen_tpu/data/protos && protoc --python_out=. *.proto
(protoc emits flat `import dsg_map_pb2` statements, hence the sys.path shim.)
"""

import os
import sys

_here = os.path.dirname(__file__)
if _here not in sys.path:
    sys.path.insert(0, _here)

import dsg_map_pb2  # noqa: E402,F401
import dsg_scenario_pb2  # noqa: E402,F401
