"""``vision-spectra`` command-line interface.

Preserves the reference command surface verbatim (reference:
vision_spectra/cli.py:72-576): ``train-cls``, ``pretrain-mim``, ``finetune``,
``train-mtl``, ``eval``, ``download-data``, ``info`` plus the ``experiments``
and ``figures`` sub-apps — implemented with click (typer is not available in
this environment; option names and defaults match the reference).
"""

from __future__ import annotations

import sys
from pathlib import Path

import click

from vision_spectra_tpu import __version__


def _build_config(
    config_path,
    *,
    name,
    dataset,
    epochs,
    batch_size,
    lr,
    seed,
    device,
    smoke_test,
    data_dir,
    output_dir,
    model=None,
    loss=None,
    mask_ratio=None,
    cls_weight=None,
    mim_weight=None,
    data_axis=None,
    model_axis=None,
    aug_mode=None,
    pretrained_path=None,
    use_flash=None,
    streaming=None,
):
    """Config resolution matching the reference (cli.py:98-114): a ``-c``
    YAML is used AS-IS (the other CLI options are ignored — the reference's
    if/else does exactly this); without it the flags build the config."""
    from vision_spectra_tpu.config import DatasetName, ExperimentConfig, LossName
    from vision_spectra_tpu.core.runtime import apply_platform

    if config_path:
        _warn_ignored_flags()
        cfg = ExperimentConfig.from_yaml(config_path)
        apply_platform(cfg.device)
        return cfg
    cfg = ExperimentConfig()
    cfg.name = name
    cfg.seed = seed
    cfg.device = device if device in ("auto", "cpu", "tpu") else "auto"
    apply_platform(cfg.device)  # --device cpu/tpu takes effect in-process
    cfg.dataset.name = DatasetName(dataset)
    cfg.dataset.batch_size = batch_size
    cfg.optimizer.learning_rate = lr
    cfg.training.epochs = epochs
    cfg.training.smoke_test = smoke_test
    cfg.data_dir = Path(data_dir)
    cfg.output_dir = Path(output_dir)
    if model is not None:
        cfg.model.name = model
    if loss is not None:
        cfg.loss.classification = LossName(loss)
    if mask_ratio is not None:
        cfg.model.mask_ratio = mask_ratio
    if cls_weight is not None:
        cfg.loss.mtl_cls_weight = cls_weight
    if mim_weight is not None:
        cfg.loss.mtl_mim_weight = mim_weight
    if data_axis is not None:
        cfg.parallel.data_axis = data_axis
    if model_axis is not None:
        cfg.parallel.model_axis = model_axis
    if aug_mode is not None:
        cfg.dataset.aug_mode = aug_mode
    if pretrained_path is not None:
        cfg.model.pretrained = True
        cfg.model.pretrained_path = Path(pretrained_path)
    if use_flash is not None:
        cfg.model.use_flash = use_flash
    if streaming is not None:
        cfg.training.streaming = streaming
    return cfg


def _warn_ignored_flags() -> None:
    """With ``-c`` the YAML is used exclusively (reference cli.py:98-114);
    tell the user which explicitly-passed flags were therefore dropped."""
    ctx = click.get_current_context(silent=True)
    if ctx is None:
        return
    ignored = []
    for param in ctx.command.params:
        # Positional arguments (e.g. finetune's checkpoint) are consumed
        # regardless of -c and cannot live in the YAML — never report them.
        if param.name == "config_path" or isinstance(param, click.Argument):
            continue
        src = ctx.get_parameter_source(param.name)
        if src is not None and src.name == "COMMANDLINE":
            opt = max(param.opts, key=len) if param.opts else param.name
            ignored.append(opt)
    if ignored:
        click.echo(
            f"Warning: --config is exclusive; ignoring {', '.join(ignored)} "
            "(set these fields in the YAML instead)",
            err=True,
        )


def _prepare(cfg):
    """Seed, dataset, encoder, dtype — the shared setup for all regimes."""
    import jax.numpy as jnp

    from vision_spectra_tpu.config import set_seed
    from vision_spectra_tpu.data import get_dataset
    from vision_spectra_tpu.models import build_vit

    set_seed(cfg.seed)
    dataset = get_dataset(cfg.dataset, cfg.data_dir)
    info = dataset.get_info()
    dtype = (
        jnp.bfloat16
        if (cfg.training.mixed_precision and cfg.get_platform() == "tpu")
        else jnp.float32
    )
    from vision_spectra_tpu.models.vit import resolve_use_flash

    encoder, desc = build_vit(
        cfg.model.name,
        num_classes=info.num_classes,
        num_channels=info.num_channels,
        image_size=cfg.dataset.image_size,
        drop_rate=cfg.model.drop_rate,
        attn_drop_rate=cfg.model.attn_drop_rate,
        drop_path_rate=cfg.model.drop_path_rate,
        embed_dim=cfg.model.embed_dim,
        depth=cfg.model.depth,
        num_heads=cfg.model.num_heads,
        dtype=dtype,
        use_flash=resolve_use_flash(cfg.model.use_flash),
    )
    return dataset, info, encoder, desc, dtype


# Common option decorators ----------------------------------------------------


def _common_options(defaults):
    def deco(f):
        f = click.option("--streaming", is_flag=True, default=False, help="Force the per-step streaming trainer (default: fused epochs on resident datasets)")(f)
        f = click.option("--use-flash/--no-use-flash", "use_flash", default=None, help="Flash (Pallas) attention; default auto (TPU + N>=1024)")(f)
        f = click.option("--pretrained-path", default=None, type=click.Path(exists=True, path_type=Path), help="timm ViT state_dict (.pth/.npz) to import")(f)
        f = click.option("--model-axis", default=None, type=int, help="Tensor-parallel mesh axis size (default 1)")(f)
        f = click.option("--data-axis", default=None, type=int, help="Data-parallel mesh axis size (-1 = all devices)")(f)
        f = click.option("--aug-mode", default=None, type=click.Choice(["fused", "torchvision"]), help="Train augmentation semantics")(f)
        f = click.option("--output-dir", type=click.Path(path_type=Path), default=Path("runs"), help="Output directory")(f)
        f = click.option("--data-dir", type=click.Path(path_type=Path), default=Path("data"), help="Data directory")(f)
        f = click.option("--smoke-test", is_flag=True, default=False, help="Quick test mode")(f)
        f = click.option("--config", "-c", "config_path", type=click.Path(exists=True, path_type=Path), default=None, help="Config YAML file")(f)
        f = click.option("--name", "-n", default=defaults["name"], help="Experiment name")(f)
        f = click.option("--device", default="auto", help="Device (auto/cpu/tpu)")(f)
        f = click.option("--seed", "-s", default=42, help="Random seed")(f)
        f = click.option("--lr", default=defaults.get("lr", 1e-4), help="Learning rate")(f)
        f = click.option("--batch-size", "-b", default=64, help="Batch size")(f)
        f = click.option("--epochs", "-e", default=defaults["epochs"], help="Number of epochs")(f)
        f = click.option("--dataset", "-d", default="pathmnist", help="Dataset name")(f)
        return f

    return deco


@click.group()
@click.version_option(__version__, "--version")
def main() -> None:
    """vision-spectra: TPU-native ViT training with spectral analysis."""
    from vision_spectra_tpu.core.runtime import (
        apply_platform,
        enable_compilation_cache,
    )

    apply_platform()  # honor JAX_PLATFORMS before any backend init
    enable_compilation_cache()


@main.command("train-cls")
@_common_options({"name": "cls_experiment", "epochs": 50})
@click.option("--loss", "-l", default="cross_entropy", help="Loss function")
@click.option("--model", "-m", default="vit_tiny_patch16_224", help="Model name")
def train_cls(dataset, epochs, batch_size, lr, seed, device, name, config_path,
              smoke_test, data_dir, output_dir, aug_mode, data_axis,
              model_axis, pretrained_path, use_flash, streaming, loss, model):
    """Train a ViT classifier (reference: cli.py:72-157)."""
    from vision_spectra_tpu.config import LossName
    from vision_spectra_tpu.losses import get_loss
    from vision_spectra_tpu.training import ClassificationTrainer, select_trainer

    cfg = _build_config(
        config_path, name=name, dataset=dataset, epochs=epochs,
        batch_size=batch_size, lr=lr, seed=seed, device=device,
        smoke_test=smoke_test, data_dir=data_dir, output_dir=output_dir,
        model=model, loss=loss, data_axis=data_axis, model_axis=model_axis,
        aug_mode=aug_mode, pretrained_path=pretrained_path, use_flash=use_flash,
        streaming=streaming,
    )
    ds, info, encoder, desc, _ = _prepare(cfg)
    counts = (
        info.class_counts["train"]
        if cfg.loss.classification == LossName.CLASS_BALANCED
        else None
    )
    loss_fn = get_loss(cfg.loss, samples_per_class=counts)
    trainer = select_trainer(ClassificationTrainer, cfg, ds)(cfg, encoder, ds, loss_fn)
    history = trainer.train()
    click.echo(f"Final: {history}")
    trainer.cleanup()


@main.command("pretrain-mim")
@_common_options({"name": "mim_pretrain", "epochs": 100})
@click.option("--mask-ratio", default=0.75, help="Masking ratio")
@click.option("--model", "-m", default="vit_tiny_patch16_224", help="Model name")
def pretrain_mim(dataset, epochs, batch_size, lr, seed, device, name, config_path,
                 smoke_test, data_dir, output_dir, aug_mode, data_axis,
                 model_axis, pretrained_path, use_flash, streaming,
                 mask_ratio, model):
    """MAE-style masked-image-modeling pretraining (reference: cli.py:160-244)."""
    from vision_spectra_tpu.models import MIMModel
    from vision_spectra_tpu.training import MIMTrainer, select_trainer

    cfg = _build_config(
        config_path, name=name, dataset=dataset, epochs=epochs,
        batch_size=batch_size, lr=lr, seed=seed, device=device,
        smoke_test=smoke_test, data_dir=data_dir, output_dir=output_dir,
        model=model, mask_ratio=mask_ratio, data_axis=data_axis,
        model_axis=model_axis, aug_mode=aug_mode,
        pretrained_path=pretrained_path, use_flash=use_flash,
        streaming=streaming,
    )
    ds, info, encoder, desc, dtype = _prepare(cfg)
    mim = MIMModel(
        encoder=encoder,
        decoder_embed_dim=cfg.model.decoder_embed_dim,
        decoder_depth=cfg.model.decoder_depth,
        decoder_num_heads=cfg.model.decoder_num_heads,
        mask_ratio=cfg.model.mask_ratio,
        norm_pix_loss=cfg.loss.mim_norm_pix,
        dtype=dtype,
    )
    trainer = select_trainer(MIMTrainer, cfg, ds)(cfg, mim, ds)
    history = trainer.train()
    click.echo(f"Final: {history}")
    trainer.cleanup()


@main.command("finetune")
@click.argument("checkpoint", type=click.Path(exists=True, path_type=Path))
@_common_options({"name": "finetune", "epochs": 30, "lr": 1e-5})
@click.option("--loss", "-l", default="cross_entropy", help="Loss function")
@click.option("--freeze", "freeze_encoder", is_flag=True, default=False, help="Freeze encoder")
@click.option("--encoder-lr-scale", default=0.1, help="Encoder LR scale for layer-wise LR")
def finetune(checkpoint, dataset, epochs, batch_size, lr, seed, device, name,
             config_path, smoke_test, data_dir, output_dir, aug_mode,
             data_axis, model_axis, pretrained_path, use_flash, streaming,
             loss, freeze_encoder, encoder_lr_scale):
    """Finetune from a pretrained checkpoint (reference: cli.py:247-338)."""
    from vision_spectra_tpu.losses import get_loss
    from vision_spectra_tpu.training import FinetuneTrainer, select_trainer
    from vision_spectra_tpu.utils.checkpointing import load_checkpoint

    cfg = _build_config(
        config_path, name=name, dataset=dataset, epochs=epochs,
        batch_size=batch_size, lr=lr, seed=seed, device=device,
        smoke_test=smoke_test, data_dir=data_dir, output_dir=output_dir,
        loss=loss, data_axis=data_axis, model_axis=model_axis,
        aug_mode=aug_mode, pretrained_path=pretrained_path, use_flash=use_flash,
        streaming=streaming,
    )
    # Read the model architecture out of the saved checkpoint config.
    ckpt = load_checkpoint(checkpoint)
    if ckpt.get("config") and "model" in ckpt["config"]:
        saved_model = ckpt["config"]["model"]
        cfg.model.name = saved_model.get("name", cfg.model.name)
        for attr in ("embed_dim", "depth", "num_heads"):
            if saved_model.get(attr) is not None:
                setattr(cfg.model, attr, saved_model[attr])
    ds, info, encoder, desc, _ = _prepare(cfg)
    loss_fn = get_loss(cfg.loss, samples_per_class=info.class_counts["train"]
                       if cfg.loss.classification.value == "class_balanced" else None)
    trainer = select_trainer(FinetuneTrainer, cfg, ds)(
        cfg, encoder, ds, loss_fn,
        pretrained_checkpoint=checkpoint,
        freeze_encoder=freeze_encoder,
        encoder_lr_scale=encoder_lr_scale,
    )
    history = trainer.train()
    click.echo(f"Final: {history}")
    trainer.cleanup()


@main.command("train-mtl")
@_common_options({"name": "mtl_experiment", "epochs": 50})
@click.option("--loss", "-l", default="cross_entropy", help="Classification loss")
@click.option("--cls-weight", default=1.0, help="Classification loss weight")
@click.option("--mim-weight", default=0.5, help="MIM loss weight")
@click.option("--mask-ratio", default=0.5, help="MIM mask ratio")
@click.option("--model", "-m", default="vit_tiny_patch16_224", help="Model name")
def train_mtl(dataset, epochs, batch_size, lr, seed, device, name, config_path,
              smoke_test, data_dir, output_dir, aug_mode, data_axis,
              model_axis, pretrained_path, use_flash, streaming, loss,
              cls_weight, mim_weight, mask_ratio, model):
    """Multitask classification + MIM training (reference: cli.py:341-444)."""
    from vision_spectra_tpu.losses import get_loss
    from vision_spectra_tpu.models import MultitaskViT
    from vision_spectra_tpu.training import MultitaskTrainer, select_trainer

    cfg = _build_config(
        config_path, name=name, dataset=dataset, epochs=epochs,
        batch_size=batch_size, lr=lr, seed=seed, device=device,
        smoke_test=smoke_test, data_dir=data_dir, output_dir=output_dir,
        model=model, loss=loss, mask_ratio=mask_ratio,
        cls_weight=cls_weight, mim_weight=mim_weight,
        data_axis=data_axis, model_axis=model_axis, aug_mode=aug_mode,
        pretrained_path=pretrained_path, use_flash=use_flash,
        streaming=streaming,
    )
    ds, info, encoder, desc, dtype = _prepare(cfg)
    mtl = MultitaskViT(
        encoder=encoder,
        decoder_embed_dim=cfg.model.decoder_embed_dim,
        decoder_depth=cfg.model.decoder_depth,
        decoder_num_heads=cfg.model.decoder_num_heads,
        mask_ratio=cfg.model.mask_ratio,
        norm_pix_loss=cfg.loss.mim_norm_pix,
        dtype=dtype,
    )
    loss_fn = get_loss(cfg.loss)
    trainer = select_trainer(MultitaskTrainer, cfg, ds)(cfg, mtl, ds, loss_fn)
    history = trainer.train()
    click.echo(f"Final: {history}")
    trainer.cleanup()


@main.command("eval")
@click.argument("checkpoint", type=click.Path(exists=True, path_type=Path))
@click.option("--dataset", "-d", default="pathmnist", help="Dataset name")
@click.option("--split", default="test", help="Dataset split (val/test)")
@click.option("--batch-size", "-b", default=64, help="Batch size")
@click.option("--device", default="auto", help="Device")
@click.option("--data-dir", type=click.Path(path_type=Path), default=Path("data"), help="Data directory")
def evaluate(checkpoint, dataset, split, batch_size, device, data_dir):
    """Evaluate a checkpoint: accuracy + macro F1 (reference: cli.py:447-531)."""
    from vision_spectra_tpu.config import DatasetName, ExperimentConfig, set_seed
    from vision_spectra_tpu.core.runtime import apply_platform

    # Same in-process platform handling as the training commands
    # (_build_config): without this, `eval --device cpu` silently attached
    # the TPU on single-tenant attachments.
    apply_platform(device if device in ("auto", "cpu", "tpu") else "auto")
    from vision_spectra_tpu.data import Loader, get_dataset
    from vision_spectra_tpu.models import build_vit
    from vision_spectra_tpu.training import evaluate_model
    from vision_spectra_tpu.utils.checkpointing import load_checkpoint

    ckpt = load_checkpoint(checkpoint)
    cfg = ExperimentConfig()
    if ckpt.get("config"):
        cfg = ExperimentConfig.model_validate(ckpt["config"])
    cfg.dataset.name = DatasetName(dataset)
    cfg.dataset.batch_size = batch_size
    cfg.data_dir = Path(data_dir)
    set_seed(cfg.seed)

    ds = get_dataset(cfg.dataset, cfg.data_dir)
    info = ds.get_info()
    model, _ = build_vit(
        cfg.model.name,
        num_classes=info.num_classes,
        num_channels=info.num_channels,
        image_size=cfg.dataset.image_size,
        embed_dim=cfg.model.embed_dim,
        depth=cfg.model.depth,
        num_heads=cfg.model.num_heads,
    )
    state = ckpt["state"]
    params = state.get("params", state)
    # Strict-less load: restore by structure; MIM checkpoints carry an
    # encoder scope.
    if isinstance(params, dict) and "encoder" in params and "head" not in params:
        params = params["encoder"]
    import flax.serialization
    import jax

    template = model.init(
        jax.random.key(0),
        __import__("jax.numpy", fromlist=["zeros"]).zeros(
            (1, cfg.dataset.image_size, cfg.dataset.image_size, info.num_channels)
        ),
    )["params"]
    params = flax.serialization.from_state_dict(template, params)

    loader = Loader(
        ds.get_test_split() if split == "test" else ds.get_val_split(),
        batch_size=batch_size,
    )
    metrics = evaluate_model(model, params, loader, info.num_classes, info.num_channels)
    click.echo(f"{split} metrics: {metrics}")


@main.command("download-data")
@click.option("--dataset", "-d", default="pathmnist", help="Dataset name")
@click.option("--data-dir", type=click.Path(path_type=Path), default=Path("data"), help="Data directory")
def download_data(dataset, data_dir):
    """Check/download MedMNIST data (reference: cli.py:539-550)."""
    from vision_spectra_tpu.data import download_medmnist

    try:
        path = download_medmnist(dataset, Path(data_dir))
        click.echo(f"Dataset available at {path}")
    except RuntimeError as e:
        click.echo(str(e), err=True)
        sys.exit(1)


@main.command("info")
def info():
    """Environment dump (reference: cli.py:553-576)."""
    import jax

    import flax
    import optax

    click.echo(f"vision-spectra-tpu {__version__}")
    click.echo(f"python     {sys.version.split()[0]}")
    click.echo(f"jax        {jax.__version__}")
    click.echo(f"flax       {flax.__version__}")
    click.echo(f"optax      {optax.__version__}")
    click.echo(f"backend    {jax.default_backend()}")
    click.echo(f"devices    {jax.devices()}")


# Sub-apps --------------------------------------------------------------------


def _register_subcommands() -> None:
    from vision_spectra_tpu.analysis.publication_figures import figures
    from vision_spectra_tpu.experiments.cli import experiments

    main.add_command(experiments)
    main.add_command(figures)


try:  # experiments/figures are optional at import time during bootstrap
    _register_subcommands()
except ImportError:  # pragma: no cover
    pass


if __name__ == "__main__":
    main()
