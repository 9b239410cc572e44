"""ROS2 launch for the sadvio_tpu online node + RViz.

Analog of the reference bring-up (reference: ros/launch/isae_slam.xml --
rviz2 with isae_slam.rviz + the SLAM node; ros/src/main.cpp:9-66).  The
node is a plain python module (sadvio_tpu.ros2_node), not an ament-built
executable, so it launches via ExecuteProcess with PYTHONPATH pointing at
the repo; rviz2 loads the sibling sadvio_slam.rviz display set matching
the node's publishers (slam/pose, slam/trajectory, slam/local_cloud,
slam/global_cloud, slam/dense_cloud, slam/mesh).

Usage:
    ros2 launch ros2/launch/sadvio_slam.launch.py \
        config_dir:=/path/to/configs/euroc_stereo_vio [rviz:=false]
"""

import os

from launch import LaunchDescription
from launch.actions import DeclareLaunchArgument, ExecuteProcess
from launch.conditions import IfCondition
from launch.substitutions import LaunchConfiguration
from launch_ros.actions import Node

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def generate_launch_description():
    config_dir = LaunchConfiguration("config_dir")
    rviz = LaunchConfiguration("rviz")
    rviz_config = os.path.join(REPO, "ros2", "sadvio_slam.rviz")

    slam = ExecuteProcess(
        cmd=["python3", "-m", "sadvio_tpu.ros2_node",
             "--ros-args", "-p", ["config_dir:=", config_dir]],
        additional_env={"PYTHONPATH":
                        REPO + os.pathsep + os.environ.get("PYTHONPATH", "")},
        output="screen",
        name="sadvio_tpu",
    )
    rviz_node = Node(
        package="rviz2", executable="rviz2", name="rviz",
        arguments=["-d", rviz_config],
        condition=IfCondition(rviz),
    )
    return LaunchDescription([
        DeclareLaunchArgument(
            "config_dir",
            default_value=os.path.join(REPO, "configs", "euroc_bimonovio"),
            description="preset directory holding config.yaml + dataset.yaml"),
        DeclareLaunchArgument("rviz", default_value="true"),
        slam,
        rviz_node,
    ])
