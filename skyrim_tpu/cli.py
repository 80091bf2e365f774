"""Console script ``forecast`` (reference skyrim/forecast.py:59-147).

Same flags as the reference CLI; defers heavy imports so ``--help`` and
``-l/--list_models`` work instantly on any machine.  Includes fuxi and
fengwu in the choices (the reference's AVAILABLE_MODELS omitted them —
a recorded defect, SURVEY.md §7).
"""

from __future__ import annotations

import datetime

import click

MODEL_CHOICES = [
    "pangu", "fourcastnet", "fourcastnet_v2", "graphcast", "dlwp", "fuxi", "fengwu",
]
IC_CHOICES = ["cds", "gfs", "ifs", "synthetic", "file"]


def run_forecast(
    model_name: str,
    date: str,
    time: str,
    lead_time: int,
    initial_conditions: str,
    output_dir: str,
    filter_vars: str,
    ic_path: str | None = None,
) -> tuple:
    """Core run path (reference forecast.py:19-56); heavy imports deferred."""
    from skyrim_tpu.core import Skyrim
    from skyrim_tpu.io.save import SaveConfig
    from skyrim_tpu.utils.logging import logger

    ic = initial_conditions
    if ic == "file":
        if not ic_path:
            raise click.UsageError("--ic-path is required with -ic file")
        ic = f"file:{ic_path}"
    model = Skyrim(model_name, ic_source=ic)
    cfg = SaveConfig(
        output_dir=output_dir,
        filter_vars=tuple(v for v in filter_vars.split(",") if v),
    )
    pred, paths = model.predict(
        date=date, time=time, lead_time=lead_time, save=True, save_config=cfg
    )
    logger.success("forecast complete: %d files", len(paths))
    return pred, paths


@click.command()
@click.option("-m", "--model_name", type=click.Choice(MODEL_CHOICES), default="pangu",
              help="model to run")
@click.option("--date", "-d", type=str,
              default=(datetime.datetime.now(datetime.timezone.utc)
                       - datetime.timedelta(days=1)).strftime("%Y%m%d"),
              help="start date YYYYMMDD (default yesterday)")
@click.option("--time", "-t", type=str, default="0000", help="start time HHMM")
@click.option("--lead_time", "-lt", type=int, default=6,
              help="lead time in hours (floored to the model step)")
@click.option("--list_models", "-l", is_flag=True, help="list available models")
@click.option("--initial_conditions", "-ic", type=click.Choice(IC_CHOICES),
              default="gfs", help="initial-condition source")
@click.option("--ic-path", type=str, default=None,
              help="path to a saved IC/forecast (with -ic file)")
@click.option("--output_dir", "-o", type=str, default="outputs",
              help="local dir or s3:// target")
@click.option("--filter_vars", "-f", type=str, default="",
              help="comma-separated channels to keep when saving")
@click.option("--remote", "--modal", "remote", is_flag=True,
              help="run serverless via the remote launcher (reference's --modal)")
def main(model_name, date, time, lead_time, list_models, initial_conditions,
         ic_path, output_dir, filter_vars, remote):
    if list_models:
        click.echo("Available models:")
        for m in MODEL_CHOICES:
            click.echo(f"  {m}")
        return
    if remote:
        from skyrim_tpu.serverless import run_remote

        run_remote(
            model_name=model_name, date=date, time=time, lead_time=lead_time,
            initial_conditions=initial_conditions, output_dir=output_dir,
            filter_vars=filter_vars, ic_path=ic_path,
        )
        return
    run_forecast(
        model_name, date, time, lead_time, initial_conditions,
        output_dir, filter_vars, ic_path,
    )


if __name__ == "__main__":
    main()
