"""Base scheduler (ref: sarathi-lean/sarathi/core/scheduler/base_scheduler.py:20-155)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import List

from vattention_tpu.config import BaseSchedulerConfig, CacheConfig
from vattention_tpu.core.block_space_manager.block_space_manager_registry import (
    BlockSpaceManagerRegistry,
)
from vattention_tpu.core.block_space_manager.vattention_block_space_manager import (
    vAttentionBlockSpaceManager,
)
from vattention_tpu.core.datatypes.scheduler_output import SchedulerOutputs
from vattention_tpu.core.datatypes.sequence import Sequence
from vattention_tpu.core.datatypes.sequence_status import SequenceStatus
from vattention_tpu.core.policy import PolicyFactory
from vattention_tpu.logger import init_logger
from vattention_tpu.model_executor.attention import AttentionBackend

logger = init_logger(__name__)


class BaseScheduler(ABC):
    def __init__(self, scheduler_config: BaseSchedulerConfig,
                 cache_config: CacheConfig) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self._iteration_id = -1
        self.policy = PolicyFactory.get_policy(policy_name="fcfs")
        self.num_running_batches = 0
        self.waiting: List[Sequence] = []
        self.running: List[Sequence] = []
        self.block_manager = None

    def set_block_manager(self, model_config) -> None:
        """ref base_scheduler.py:53-69: vATTN backends always get the
        vAttentionBlockSpaceManager regardless of scheduler type."""
        attn_cfg = model_config.attention_backend
        self.attention_backend = attn_cfg
        if AttentionBackend.is_vATTN(attn_cfg):
            self.block_manager = vAttentionBlockSpaceManager(
                self.cache_config.block_size,
                self.cache_config.num_gpu_blocks,
                self.scheduler_config.max_model_len,
            )
        else:
            self.block_manager = BlockSpaceManagerRegistry.get(
                self.scheduler_config.type,
                self.cache_config.block_size,
                self.cache_config.num_gpu_blocks,
                self.scheduler_config.max_model_len,
            )

    def reset_state(self) -> None:
        self._iteration_id = -1

    def add_seq(self, seq: Sequence) -> None:
        self.waiting.append(seq)

    def has_unfinished_seqs(self) -> bool:
        return bool(self.waiting or self.running)

    def get_num_unfinished_seqs(self) -> int:
        return len(self.waiting) + len(self.running)

    @abstractmethod
    def _schedule(self) -> SchedulerOutputs:
        ...

    def schedule(self) -> SchedulerOutputs:
        self._iteration_id += 1
        if self.num_running_batches >= self.scheduler_config.num_pipeline_stages:
            return SchedulerOutputs(
                self._iteration_id, ignored_seq_ids=[], preempted_seq_ids=[],
                scheduled_seq_metadata_list=[])
        scheduler_outputs = self._schedule()
        if not scheduler_outputs.is_empty():
            self.num_running_batches += 1
        return scheduler_outputs

    def remove_finished_seqs(self) -> None:
        self.running = [seq for seq in self.running if not seq.is_finished()]

    def free_finished_seqs(self) -> None:
        for seq in self.running:
            if seq.is_finished():
                self._free_seq(seq)

    def on_step_completed(self) -> None:
        self.free_finished_seqs()
        self.remove_finished_seqs()
        self.num_running_batches -= 1

    def _allocate(self, seq: Sequence) -> None:
        self.block_manager.allocate(seq)

    def _free_seq(self, seq: Sequence) -> None:
        self.block_manager.free(seq)

    def _append_slot(self, seq: Sequence) -> None:
        assert seq.is_executing()
        self.block_manager.append_slot(seq)

    def _preempt(self, seq: Sequence) -> None:
        """Free + restart-from-scratch (ref :135-143)."""
        assert seq.is_executing()
        self._free_seq(seq)
        if isinstance(self.block_manager, vAttentionBlockSpaceManager):
            self.block_manager.preemption_queue.append(seq)
        self.waiting.insert(0, seq)

    def _check_request_prompt_length(self, seq: Sequence) -> bool:
        if seq.get_len() > self.scheduler_config.max_model_len:
            logger.warning(
                "Input prompt (%d tokens) is too long and exceeds limit of %d",
                seq.get_len(), self.scheduler_config.max_model_len)
            seq.set_status(SequenceStatus.FINISHED_IGNORED)
            self.waiting.pop(0)
            return False
        return True
