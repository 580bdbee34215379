from setuptools import setup, find_packages

setup(
    name='odtk-tpu',
    version='0.3.0',
    description='TPU-native object detection toolkit (RetinaNet family): '
                'train, infer, export on JAX/XLA/Pallas',
    packages=find_packages(exclude=['tests']),
    python_requires='>=3.10',
    install_requires=['jax', 'flax', 'optax', 'numpy', 'Pillow'],
    entry_points={'console_scripts': ['odtk-tpu = odtk_tpu.main:main']},
)
