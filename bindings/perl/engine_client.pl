#!/usr/bin/perl
# engine_client.pl — a pure-Perl consumer of the stringzilla-tpu engine
# serving protocol (stringzilla_tpu/serve.py): the process boundary that
# plays the role the reference's szs_* engine C ABI plays in-process
# (include/stringzillas/stringzillas.h:104-597).  Uses only core modules
# (IO::Socket::UNIX, JSON::PP, Digest::SHA), so it runs on any stock
# perl — no XS, no C toolchain.
#
# Wire format (little-endian):
#   request:  u32 header_len | JSON header | raw array blocks
#   response: u32 header_len | JSON header | raw array blocks
# String collections travel as Arrow-style tapes:
#   <name>_offsets (int64, count+1) + <name>_data (uint8).
#
# Covers the ops the compiled C client (bindings/c/engine_client.c) does
# NOT: levenshtein_utf8 (rune-level DP checked against a Perl
# Wagner-Fischer oracle over characters), smith_waterman (class table +
# affine gaps cross the wire; expected scores are passed on the command
# line by the pytest harness, computed by its independent Gotoh oracle),
# and sha256 (checked against core Digest::SHA — a fully independent
# second implementation).
#
# Usage: engine_client.pl <socket-path> [expected-sw-scores...]
# Exit 0 on success.  Run in CI by tests/test_bindings.py::test_perl_engine_client.
use strict;
use warnings;
use utf8;
use IO::Socket::UNIX;
use JSON::PP;
use Digest::SHA qw(sha256);

my ($path, @expect_sw) = @ARGV;
die "usage: $0 <socket-path> [expected-sw-scores...]\n" unless $path;

my $sock = IO::Socket::UNIX->new(Type => SOCK_STREAM(), Peer => $path)
    or die "connect $path: $!";
binmode $sock;

sub write_all {
    my ($buf) = @_;
    my $off = 0;
    while ($off < length $buf) {
        my $w = syswrite($sock, $buf, length($buf) - $off, $off);
        die "syswrite: $!" unless defined $w && $w > 0;
        $off += $w;
    }
}

sub read_exact {
    my ($n) = @_;
    my $buf = '';
    while (length($buf) < $n) {
        my $r = sysread($sock, $buf, $n - length($buf), length($buf));
        die "peer closed mid-message" unless defined $r && $r > 0;
    }
    return $buf;
}

# blocks: [name, dtype, [shape...], raw-bytes]
sub request {
    my ($header, @blocks) = @_;
    $header->{payload} = [map { [$_->[0], $_->[1], $_->[2]] } @blocks];
    my $json = JSON::PP->new->encode($header);
    write_all(pack("V", length $json) . $json);
    write_all($_->[3]) for @blocks;

    my $hlen = unpack("V", read_exact(4));
    my $resp = JSON::PP->new->decode(read_exact($hlen));
    die "server error: " . ($resp->{error} // "?") . "\n" unless $resp->{ok};
    my @out;
    for my $blk (@{$resp->{payload}}) {
        my ($name, $dtype, $shape) = @$blk;
        my $count = 1;
        $count *= $_ for @$shape;
        my %isize = (int64 => 8, uint64 => 8, int32 => 4, uint32 => 4,
                     uint8 => 1);
        my $sz = $isize{$dtype} or die "unexpected dtype $dtype";
        push @out, [$dtype, read_exact($count * $sz)];
    }
    return @out;
}

# Arrow-style tape from a list of byte strings.
sub tape_blocks {
    my ($name, @items) = @_;
    my @offs = (0);
    my $data = '';
    for my $it (@items) {
        $data .= $it;
        push @offs, length $data;
    }
    return ([$name . "_offsets", "int64", [scalar @offs], pack("q<*", @offs)],
            [$name . "_data", "uint8", [length $data], $data]);
}

sub unpack_i64 { return unpack("q<*", $_[0][1]) }

# --- levenshtein_utf8: rune-level distances vs a Perl oracle ------------
{
    my @queries = ("café", "naïve", "écho");
    my @cands   = ("cafe", "naive", "echo", "café");
    # character-level Wagner-Fischer
    my $lev = sub {
        my (@a) = split //, $_[0];
        my (@b) = split //, $_[1];
        my @row = (0 .. scalar @b);
        for my $i (1 .. scalar @a) {
            my @next = ($i);
            for my $j (1 .. scalar @b) {
                my $sub = $row[$j - 1] + ($a[$i - 1] eq $b[$j - 1] ? 0 : 1);
                my $del = $row[$j] + 1;
                my $ins = $next[$j - 1] + 1;
                my $m = $sub < $del ? $sub : $del;
                push @next, ($m < $ins ? $m : $ins);
            }
            @row = @next;
        }
        return $row[-1];
    };
    my @want;
    for my $q (@queries) { push @want, map { $lev->($q, $_) } @cands }
    my @enc_q = map { my $s = $_; utf8::encode($s); $s } @queries;
    my @enc_c = map { my $s = $_; utf8::encode($s); $s } @cands;
    my ($res) = request({op => "levenshtein_utf8",
                         queries => scalar @enc_q,
                         candidates => scalar @enc_c},
                        tape_blocks("queries", @enc_q),
                        tape_blocks("candidates", @enc_c));
    my @got = unpack_i64($res);
    for my $i (0 .. $#want) {
        die "FAIL levenshtein_utf8[$i] = $got[$i] want $want[$i]\n"
            unless $got[$i] == $want[$i];
    }
    print "levenshtein_utf8 over the wire: PASS\n";
}

# --- smith_waterman: class table + affine gaps over the wire ------------
# Expected scores come from the pytest harness's independent Gotoh oracle.
if (@expect_sw) {
    my @queries = ("GATTACA", "ACGT");
    my @cands   = ("GCATGCU", "TACGTA", "AAAA");
    die "need " . (@queries * @cands) . " expected scores\n"
        unless @expect_sw == @queries * @cands;
    # byte -> class map: A,C,G,T,U -> 0..4, everything else class 5
    my @b2c = (5) x 256;
    my %cls = (A => 0, C => 1, G => 2, T => 3, U => 4);
    $b2c[ord $_] = $cls{$_} for keys %cls;
    # 32x32 substitution costs (the engine's fixed class-table shape,
    # reference analog: the 26x26 protein matrices padded to a tile):
    # +3 match, -1 mismatch
    my @costs;
    for my $i (0 .. 31) {
        for my $j (0 .. 31) { push @costs, ($i == $j ? 3 : -1) }
    }
    my ($res) = request({op => "smith_waterman", open => -2, extend => -1,
                         queries => scalar @queries,
                         candidates => scalar @cands},
                        tape_blocks("queries", @queries),
                        tape_blocks("candidates", @cands),
                        ["byte_to_class", "uint8", [256], pack("C*", @b2c)],
                        ["costs", "int32", [32, 32], pack("l<*", @costs)]);
    my @got = unpack_i64($res);
    for my $i (0 .. $#expect_sw) {
        die "FAIL smith_waterman[$i] = $got[$i] want $expect_sw[$i]\n"
            unless $got[$i] == $expect_sw[$i];
    }
    print "smith_waterman over the wire: PASS\n";
}

# --- sha256: differential vs core Digest::SHA ---------------------------
{
    my @texts = ("", "abc", "The quick brown fox jumps over the lazy dog",
                 "x" x 1000, join("", map { chr($_ % 256) } 0 .. 4095));
    my ($res) = request({op => "sha256", texts => scalar @texts},
                        tape_blocks("texts", @texts));
    my ($dtype, $raw) = @{$res};
    die "sha256 payload size" unless length($raw) == 32 * @texts;
    for my $i (0 .. $#texts) {
        my $got = substr($raw, 32 * $i, 32);
        my $want = sha256($texts[$i]);
        die "FAIL sha256[$i]: " . unpack("H*", $got) . " want "
            . unpack("H*", $want) . "\n"
            unless $got eq $want;
    }
    print "sha256 over the wire: PASS\n";
}

exit 0;
