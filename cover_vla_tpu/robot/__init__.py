from cover_vla_tpu.robot.devices import (
    Camera, MotorBus, MockCamera, MockMotorBus, RobotInterface,
    make_mock_robot)
